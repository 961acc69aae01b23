"""Shared utilities: config loading, logging, profiling helpers."""

from .config import load_config, merge_config
