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
from .sort_join import (join_build, join_probe_count,
                        join_probe_count_table, join_emit)
from .ms_join import join_probe_count_auto, join_probe_count_ms
from .agg_join import (join_checksum_fused, join_checksum_fused_presorted,
                       join_checksum_fused_table,
                       join_checksum_fused_table_pref, prefix_by_perm)
from .radix_join import (fused_join_auto, ms_member_selected, plan_bits,
                         radix_fused_static,
                         radix_join_checksum, radix_member_selected,
                         radix_prep_keys)
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
    "join_probe_count_auto",
    "join_probe_count_ms",
    "join_emit",
    "join_checksum_fused",
    "join_checksum_fused_presorted",
    "join_checksum_fused_table",
    "join_checksum_fused_table_pref",
    "prefix_by_perm",
    "join_probe_count_table",
    "fused_join_auto",
    "plan_bits",
    "radix_fused_static",
    "radix_join_checksum",
    "radix_member_selected",
    "ms_member_selected",
    "radix_prep_keys",
    "cartesian_indices",
]
