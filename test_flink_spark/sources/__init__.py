"""Source builders (SURVEY.md §2.1 S1-S4): Kafka (topic / topic-pattern),
files (batch + streaming), rate (tests)."""
