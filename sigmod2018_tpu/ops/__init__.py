from .select import (
    compare_mask,
    equal_mask,
    mask_positions,
    gather_u64,
    gather_rows,
    take_cols,
    checksum,
    checksum_many,
)
from .sort_join import join_build, join_probe_count, join_emit
from .cartesian import cartesian_indices

__all__ = [
    "compare_mask",
    "mask_positions",
    "gather_u64",
    "gather_rows",
    "take_cols",
    "checksum",
    "join_build",
    "join_probe_count",
    "join_emit",
    "cartesian_indices",
]
