from .rng import CRandom
from .hitlist import Hitlist

__all__ = ["CRandom", "Hitlist"]
