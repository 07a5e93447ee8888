"""End-to-end pipeline compositions mirroring the reference's four
data flows (SURVEY §3), with plain Python sequencing replacing Step
Functions and Structured Streaming replacing Kinesis+Lambda."""
