"""Utilities: metrics, configs, observability."""

from .metrics import relative_l2, r2_score, squared_error_sum
