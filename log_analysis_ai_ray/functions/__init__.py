"""Scalar / vectorized helper functions (hashing, timestamps, syslog)."""
