from cuttana_ray.stages.edges import (
    bipartite_edges,
    build_adjacency,
    consecutive_pairs,
    dedup_weighted,
    symmetrize,
)
from cuttana_ray.stages.joins import (
    asof_join,
    cross_join_broadcast,
    bloom_filter_build,
    bloom_prune,
    interval_overlap_join,
    range_join,
    skew_join,
)
from cuttana_ray.stages.jsoncol import json_extract_scalars
from cuttana_ray.stages.layout import zorder_key, zorder_sort
from cuttana_ray.stages.nested import explode_list
from cuttana_ray.stages.relational import (
    anti_join,
    cube_agg,
    distinct_count_agg,
    except_distinct,
    grouped_topk,
    grouping_sets_agg,
    intersect_distinct,
    mode_agg,
    pivot_agg,
    rollup_agg,
    semi_join,
    string_agg_ordered,
    table_diff,
    union_distinct,
    unpivot,
)
from cuttana_ray.stages.stats import (
    grouped_entropy,
    grouped_linreg,
    grouped_moments,
    grouped_outliers,
)
from cuttana_ray.stages.keyblocks import (
    grouped_ewma,
    key_aligned_refs,
    within_group_pairs,
)
from cuttana_ray.stages.metrics import assignment_array, partition_quality
from cuttana_ray.stages.profile import profile
from cuttana_ray.stages.partition_stage import (
    hash_partition_baseline,
    run_cuttana_partition,
)
from cuttana_ray.stages.running import (
    coalesce_intervals,
    lag_columns,
    moving_agg,
    rank_windows,
    running_agg,
    running_max_agg,
)
from cuttana_ray.stages.vocab import build_vocab, decode_column, encode_edges
from cuttana_ray.stages.windows import (
    funnel_counts,
    hopping_window_agg,
    session_counts,
    tumbling_window_agg,
)

__all__ = [
    "anti_join",
    "asof_join",
    "bloom_filter_build",
    "bloom_prune",
    "cross_join_broadcast",
    "interval_overlap_join",
    "range_join",
    "skew_join",
    "zorder_key",
    "zorder_sort",
    "lag_columns",
    "coalesce_intervals",
    "running_max_agg",
    "assignment_array",
    "grouped_topk",
    "pivot_agg",
    "rollup_agg",
    "cube_agg",
    "distinct_count_agg",
    "except_distinct",
    "explode_list",
    "grouped_entropy",
    "grouped_moments",
    "grouped_linreg",
    "grouped_outliers",
    "grouped_ewma",
    "key_aligned_refs",
    "within_group_pairs",
    "grouping_sets_agg",
    "intersect_distinct",
    "json_extract_scalars",
    "mode_agg",
    "semi_join",
    "table_diff",
    "string_agg_ordered",
    "union_distinct",
    "unpivot",
    "bipartite_edges",
    "build_adjacency",
    "build_vocab",
    "consecutive_pairs",
    "decode_column",
    "dedup_weighted",
    "encode_edges",
    "hash_partition_baseline",
    "funnel_counts",
    "hopping_window_agg",
    "partition_quality",
    "profile",
    "moving_agg",
    "rank_windows",
    "run_cuttana_partition",
    "running_agg",
    "session_counts",
    "symmetrize",
    "tumbling_window_agg",
]
