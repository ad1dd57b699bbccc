from .mesh import make_mesh
from .sharded import sharded_som_step, sharded_winner_search, make_sharded_som_train_step

__all__ = [
    "make_mesh",
    "sharded_som_step",
    "sharded_winner_search",
    "make_sharded_som_train_step",
]
