"""The two reference jobs reassembled over the operator library, each in
batch AND streaming form over the same logical plan (the batch/stream parity
the reference only hinted at with its commented-out file source —
SURVEY.md §3.3)."""
