"""Uncertainty quantification for the conditional-flow surrogate."""

from .uq import GlowSurrogate, UQCondGlow
