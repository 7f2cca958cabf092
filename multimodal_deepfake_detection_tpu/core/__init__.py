from .precision import Policy, cast_tree, DEFAULT_POLICY, TPU_POLICY
from .rng import RngStream
