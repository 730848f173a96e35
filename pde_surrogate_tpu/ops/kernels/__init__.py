"""Pallas TPU kernels (in-VMEM iterative solvers)."""

from .cg_darcy import solve_darcy_pallas

__all__ = ["solve_darcy_pallas"]
