from .humanml3d import HumanML3DDataset
from .interhuman import InterHumanDataset
from .loader import DataLoader, collate
from .synthetic import make_hml3d_fixture, make_interhuman_fixture

__all__ = [
    "DataLoader",
    "HumanML3DDataset",
    "InterHumanDataset",
    "collate",
    "make_hml3d_fixture",
    "make_interhuman_fixture",
]
