from .artifacts import ArtifactStore
from .nifti import load_volume, save_volume

__all__ = ["ArtifactStore", "load_volume", "save_volume"]
