from .som import randinit, lininit, som_train, find_qerror, find_qerror2

__all__ = [
    "randinit",
    "lininit",
    "som_train",
    "find_qerror",
    "find_qerror2",
]
