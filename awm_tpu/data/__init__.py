from awm_tpu.data.dataset import (
    OneSecClips,
    BatchLoader,
    ConcatClips,
    SyntheticClips,
    SyntheticMusicClips,
    split_indices,
)

__all__ = ["OneSecClips", "BatchLoader", "ConcatClips", "SyntheticClips", "SyntheticMusicClips", "split_indices"]
