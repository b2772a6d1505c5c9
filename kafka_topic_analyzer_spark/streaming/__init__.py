"""Structured Streaming mode — bounded AvailableNow runs reproduce the
reference's "read to the end then stop" semantics (reference
``src/kafka.rs:119-131``); the same metric expressions run unmodified."""
