from .artifacts import ArtifactStore
from .nifti import load_volume, mask_volume, refine_brain_mask, save_volume
from .stitch import get_boundary, merge_volume, stitch_scans

__all__ = ["ArtifactStore", "load_volume", "save_volume",
           "mask_volume", "refine_brain_mask",
           "get_boundary", "merge_volume", "stitch_scans"]
