"""Numeric ops: stencil filters, Darcy physics losses, samplers, LHS."""

from .filters import SobelFilter, FourierFilter, GaussianFilter, stencil_matrix
from .darcy import (
    conv_constitutive_constraint,
    conv_constitutive_constraint_nonlinear,
    conv_constitutive_constraint_nonlinear_exp,
    conv_continuity_constraint,
    conv_boundary_condition,
    energy_functional_exp,
    mixed_residual_loss,
    reconstruct_pressure,
    flux_pressure_consistency,
    fv_cg_anchors,
    fv_cg_u_error,
    fv_cg_error_loss,
    fv_mixed_residual_loss,
    bilinear_interpolate,
    mixed_residual_fc,
    primal_residual_fc,
    primal_variational_fc,
    neumann_boundary_mixed,
    neumann_boundary,
)
from .lhs import lhs
from .sampling import SampleSpatial2d
