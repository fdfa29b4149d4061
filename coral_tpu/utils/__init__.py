"""Shared utilities: Hub upload, logging helpers."""
