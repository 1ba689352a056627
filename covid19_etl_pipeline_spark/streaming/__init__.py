"""Structured Streaming operators (SURVEY §2.9: none exist in the
reference — its 'real-time' is a daily cron + TTL cache. This package is
the engine's streaming generalization of the same rollups)."""
