"""Structured Streaming pipelines (K4): tumbling windows with watermark,
session windows. Importing registers streaming query-surface entries."""
