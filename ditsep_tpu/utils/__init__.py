"""Utilities: registries, batch helpers, checkpointing, misc."""
from ditsep_tpu.utils.misc import (
    AutoClipper,
    SplitDirectory,
    StandardScaler,
    clip_update_by_threshold,
    count_parameters,
    solve_psd_loaded,
)
from ditsep_tpu.utils.registry import Registry
from ditsep_tpu.utils.separate import (
    denormalize_batch,
    normalize_batch,
    pad_to_hop,
    power_order_sources,
    select_elem_at_random,
    shuffle_sources,
)
