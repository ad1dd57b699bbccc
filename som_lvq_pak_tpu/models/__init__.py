from .som import randinit, lininit, som_train, find_qerror, find_qerror2
from .lvq import (
    lvq1_train,
    olvq1_train,
    lvq2_train,
    lvq3_train,
    eveninit,
    balance,
    pick_codes,
    class_nearest_stats,
    deviations,
)
from .eval import accuracy, classify, confusion_matrix, knn_accuracy, mcnemar

__all__ = [
    "randinit",
    "lininit",
    "som_train",
    "find_qerror",
    "find_qerror2",
    "lvq1_train",
    "olvq1_train",
    "lvq2_train",
    "lvq3_train",
    "eveninit",
    "balance",
    "pick_codes",
    "class_nearest_stats",
    "deviations",
    "accuracy",
    "classify",
    "confusion_matrix",
    "knn_accuracy",
    "mcnemar",
]
