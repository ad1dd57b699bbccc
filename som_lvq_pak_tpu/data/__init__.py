from .labels import LabelTable, LABEL_EMPTY
from .dataset import Dataset, Topology, Neighborhood
from .io import read_data, write_data, read_alpha_file, write_alpha_file, invalidate_alpha_file

__all__ = [
    "LabelTable",
    "LABEL_EMPTY",
    "Dataset",
    "Topology",
    "Neighborhood",
    "read_data",
    "write_data",
    "read_alpha_file",
    "write_alpha_file",
    "invalidate_alpha_file",
]
