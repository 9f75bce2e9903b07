from .events_stream import (
    STREAM_BFR_UPDATE_SQL,
    STREAM_DEDUP_SQL,
    STREAM_EVENTS_WINDOW_SQL,
    STREAM_SLIDING_WINDOW_SQL,
    STREAM_UPSERT_SINK_SQL,
    STREAM_LATE_DATA_SQL,
    STREAM_UPDATE_COUNTS_SQL,
    STREAM_CHECKPOINT_RECOVERY_SQL,
    STREAM_SESSION_WINDOW_SQL,
    STREAM_SESSIONIZE_STATEFUL_SQL,
    STREAM_STATIC_JOIN_SQL,
    STREAM_STREAM_JOIN_SQL,
    stream_bfr_rounds,
    stream_bfr_update,
    stream_dedup,
    stream_events_window,
    stream_sliding_window,
    stream_upsert_sink,
    stream_late_data,
    stream_update_counts,
    stream_checkpoint_recovery,
    stream_session_window,
    stream_sessionize_stateful,
    stream_static_join,
    stream_stream_join,
)
from ..operators.dedup import DEDUP_COMPONENTS_SQL
from ..operators.embeddings_ops import Q_DRIFT_DETECT_SQL
from ..operators.similarity import ANN_IVF_PARTITIONED_SQL
from ..plans.ml_queries import BFR_LLOYD_STATS_SQL
from .docs_stream import (
    STREAM_COUNTMIN_SQL,
    STREAM_QUALITY_FILTER_SQL,
    STREAM_TOKEN_STATS_SQL,
    stream_ann_index,
    stream_components,
    stream_countmin,
    stream_drift_detect,
    stream_quality_filter,
    stream_token_stats,
)

QUERIES = {
    "stream_countmin": stream_countmin,
    "stream_ann_index": stream_ann_index,
    "stream_components": stream_components,
    "stream_quality_filter": stream_quality_filter,
    "stream_token_stats": stream_token_stats,
    "stream_events_window": stream_events_window,
    "stream_sliding_window": stream_sliding_window,
    "stream_upsert_sink": stream_upsert_sink,
    "stream_late_data": stream_late_data,
    "stream_update_counts": stream_update_counts,
    "stream_checkpoint_recovery": stream_checkpoint_recovery,
    "stream_dedup": stream_dedup,
    "stream_sessionize_stateful": stream_sessionize_stateful,
    "stream_session_window": stream_session_window,
    "stream_stream_join": stream_stream_join,
    "stream_static_join": stream_static_join,
    "stream_bfr_update": stream_bfr_update,
    "stream_bfr_rounds": stream_bfr_rounds,
    "stream_drift_detect": stream_drift_detect,
}
ORACLES: dict[str, str] = {
    # CMS merge is exact (commutative integer sums), so the drained
    # sketch equals the batch sketch over the same corpus
    "stream_countmin": STREAM_COUNTMIN_SQL,
    # the quantizer is deterministic and fixed at setup, so the
    # drained list-partitioned index is row-identical to the batch
    # layout — same oracle as ann_ivf_partitioned
    "stream_ann_index": ANN_IVF_PARTITIONED_SQL,
    # incremental discovery is exhaustive over band collisions, so the
    # drained labelling equals batch dedup_components — same oracle
    "stream_components": DEDUP_COMPONENTS_SQL,
    # stateless filter + complete-mode agg: drained result ≡ batch agg
    "stream_quality_filter": STREAM_QUALITY_FILTER_SQL,
    # stateless token count + complete-mode agg: drained ≡ batch agg
    "stream_token_stats": STREAM_TOKEN_STATS_SQL,
    "stream_events_window": STREAM_EVENTS_WINDOW_SQL,
    "stream_sliding_window": STREAM_SLIDING_WINDOW_SQL,
    "stream_upsert_sink": STREAM_UPSERT_SINK_SQL,
    # multi-batch replay with calibrated drop/emit watermark rules —
    # the staged straggler population makes late-drop really happen
    "stream_late_data": STREAM_LATE_DATA_SQL,
    # update-mode changelog from the same staged replay
    "stream_update_counts": STREAM_UPDATE_COUNTS_SQL,
    # two-query restart on one checkpoint + file sink; collapsed-lag rule
    "stream_checkpoint_recovery": STREAM_CHECKPOINT_RECOVERY_SQL,
    "stream_dedup": STREAM_DEDUP_SQL,
    "stream_sessionize_stateful": STREAM_SESSIONIZE_STATEFUL_SQL,
    "stream_session_window": STREAM_SESSION_WINDOW_SQL,
    "stream_stream_join": STREAM_STREAM_JOIN_SQL,
    # stream-static joins are stateless enrichment: drained complete-
    # mode agg ≡ the batch join + agg
    "stream_static_join": STREAM_STATIC_JOIN_SQL,
    "stream_bfr_update": STREAM_BFR_UPDATE_SQL,
    # the chunk-ordered replay reproduces the batch det epoch exactly
    # (same init, same gate, same integer moments), so the drained
    # per-round accounting shares bfr_lloyd_stats' oracle verbatim
    "stream_bfr_rounds": BFR_LLOYD_STATS_SQL,
    # exact integer moments are order-free, so the incrementally
    # maintained state drained over any batch order equals the batch
    # scan — same oracle as q_drift_detect verbatim
    "stream_drift_detect": Q_DRIFT_DETECT_SQL,
}
