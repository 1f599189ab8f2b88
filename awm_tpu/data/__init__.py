from awm_tpu.data.dataset import (
    OneSecClips,
    BatchLoader,
    SyntheticClips,
    SyntheticMusicClips,
    split_indices,
)

__all__ = ["OneSecClips", "BatchLoader", "SyntheticClips", "SyntheticMusicClips", "split_indices"]
