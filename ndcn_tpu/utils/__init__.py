"""Shared utilities: platform selection, timing, config."""
