"""Pipeline configuration (SURVEY.md §2.9 E1).

The reference wires required CLI keys through Flink's global job parameters
(``ParameterTool.fromArgs`` → ``setGlobalJobParameters``;
HotMediaTrack.java:40-49, HotItemAnalysis.java:59-64).  The engine's
equivalent is an explicit dataclass — typed, testable, no hidden global
state — constructed from argv or a dict.
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields


@dataclass
class PipelineConfig:
    """Union of the config keys both reference jobs require."""

    kafka_url: str = ""          # HotMediaTrack.java:41 (bootstrap servers)
    kafka_from_url: str = ""     # HotItemAnalysis.java:59 (source cluster)
    mysql_url: str = ""          # HotMediaTrack.java:106
    mysql_username: str = ""     # HotMediaTrack.java:107
    mysql_password: str = ""     # HotMediaTrack.java:108
    checkpoint_dir: str = "/tmp/tfs-checkpoints"  # mandatory for streams
    allowed_lateness: str = "0 seconds"  # W3 knob (SURVEY.md §2.4)
    top_size: int = 3            # TopNHotItems ctor arg (java:177)
    extra: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_args(cls, argv: list[str]) -> "PipelineConfig":
        """ParameterTool.fromArgs equivalent: ``--key value`` pairs; unknown
        keys land in ``extra`` instead of being dropped."""
        known = {f.name for f in fields(cls)} - {"extra"}
        kwargs: dict = {}
        extra: dict[str, str] = {}
        i = 0
        while i < len(argv):
            tok = argv[i]
            if not tok.startswith("--"):
                raise ValueError(f"expected --key, got {tok!r}")
            key = tok[2:].replace("-", "_")
            if i + 1 >= len(argv):
                raise ValueError(f"missing value for --{key}")
            val = argv[i + 1]
            if key in known:
                kwargs[key] = int(val) if key == "top_size" else val
            else:
                extra[key] = val
            i += 2
        return cls(**kwargs, extra=extra)

    def require(self, *keys: str) -> "PipelineConfig":
        """Fail fast on missing required keys (the reference NPEs at first
        use instead)."""
        missing = [k for k in keys if not getattr(self, k, "")]
        if missing:
            raise ValueError(f"missing required config: {', '.join(missing)}")
        return self
