"""Structured Streaming equivalents of the reference's Kinesis+Lambda
micro-batch pipelines (SURVEY §2.10 ST1-ST8)."""
