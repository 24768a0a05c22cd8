"""Dataset registry (port of datasets/__init__.py:12-21).

Loaders are imported lazily so optional dependencies of one loader don't
break the others. `synthetic` is framework-specific (hermetic tests).
"""
from __future__ import annotations

from .base import BaseDataset


def _nerf(*a, **k):
    from .nerf import NeRFDataset
    return NeRFDataset(*a, **k)


def _nsvf(*a, **k):
    from .nsvf import NSVFDataset
    return NSVFDataset(*a, **k)


def _colmap(*a, **k):
    from .colmap import ColmapDataset
    return ColmapDataset(*a, **k)


def _nerfpp(*a, **k):
    from .nerfpp import NeRFPPDataset
    return NeRFPPDataset(*a, **k)


def _tnt(*a, **k):
    from .tnt import TNTDataset
    return TNTDataset(*a, **k)


def _kitti(*a, **k):
    from .kitti360 import KittiDataset
    return KittiDataset(*a, **k)


def _highbay(*a, **k):
    from .highbay import HighbayDataset
    return HighbayDataset(*a, **k)


def _mega(*a, **k):
    from .mega.dataset import MegaDataset
    return MegaDataset(*a, **k)


def _synthetic(*a, **k):
    from .synthetic import SyntheticDataset
    return SyntheticDataset(*a, **k)


dataset_dict = {
    "nerf": _nerf,
    "nsvf": _nsvf,
    "colmap": _colmap,
    "nerfpp": _nerfpp,
    "tnt": _tnt,
    "kitti": _kitti,
    "mega": _mega,
    "highbay": _highbay,
    "synthetic": _synthetic,
}
