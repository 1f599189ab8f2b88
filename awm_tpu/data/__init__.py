from awm_tpu.data.dataset import (
    OneSecClips,
    BatchLoader,
    SyntheticClips,
    split_indices,
)

__all__ = ["OneSecClips", "BatchLoader", "SyntheticClips", "split_indices"]
