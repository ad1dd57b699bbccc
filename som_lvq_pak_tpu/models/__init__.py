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
from .fast import (
    lvq1_batch_step,
    lvq23_batch_step,
    olvq1_batch_step,
    som_batch_step,
    unit_coords,
)
from .sammon import mapping_error, remove_identicals, sammon, sammon_fast
from .trainer import LVQTrainer, OLVQ1Trainer, SOMTrainer
from .umatrix import average_umatrix, calc_umatrix, median_umatrix

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
    "som_batch_step",
    "olvq1_batch_step",
    "lvq1_batch_step",
    "lvq23_batch_step",
    "unit_coords",
    "sammon",
    "sammon_fast",
    "mapping_error",
    "remove_identicals",
    "calc_umatrix",
    "average_umatrix",
    "median_umatrix",
    "SOMTrainer",
    "OLVQ1Trainer",
    "LVQTrainer",
]
