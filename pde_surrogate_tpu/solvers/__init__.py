"""Finite-volume Darcy solvers (the FEniCS replacement + data factory)."""

from .fd_darcy import (solve_darcy, solve_darcy_batch, solve_nonlinear_darcy,
                       darcy_fields)
