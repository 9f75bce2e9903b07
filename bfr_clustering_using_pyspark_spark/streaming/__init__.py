from .events_stream import (
    stream_bfr_update,
    stream_dedup,
    stream_events_window,
    stream_session_window,
    stream_sessionize_stateful,
    stream_stream_join,
)

QUERIES = {
    "stream_events_window": stream_events_window,
    "stream_dedup": stream_dedup,
    "stream_sessionize_stateful": stream_sessionize_stateful,
    "stream_session_window": stream_session_window,
    "stream_stream_join": stream_stream_join,
    "stream_bfr_update": stream_bfr_update,
}
ORACLES: dict[str, str] = {}
