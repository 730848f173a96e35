"""Model families: DenseED codec, Decoder, CPPN, conditional Glow."""

from .codec import DenseED, Decoder, module_size, activation
from .cppn import CPPN, ResCPPN, fc_model_size
from .glow import MultiScaleCondGlow, InputEncoder, glow_z_shapes
