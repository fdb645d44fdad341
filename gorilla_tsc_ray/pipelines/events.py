"""Event-stream pipelines over the driver's ``events`` table
(``event_id, ts: timestamp[us], user_id, event_type, value, props``).

These are the DuckDB-oracle-checked query surface: each function takes
``sf_dir`` and returns a Ray ``Dataset`` whose rows match the corresponding
SQL in ``__ray_entry__.oracle_sql()``.

Timestamps are truncated to epoch milliseconds for the codec path (the
reference format stores millisecond epochs, ``README.adoc:146``; the 27-bit
first delta bounds a block to <= 2**27-2 ms, hence day-bounded blocks).

Round 5: the 7.4k-line monolith is split into per-family modules
(events_shared / events_codec / events_windows / events_tsa /
events_advanced); this facade re-exports every public name unchanged, plus
the internal helpers tests and sibling modules reach for.
"""

from .events_shared import (  # noqa: F401
    EVENT_COLS,
    GOERTZEL_C24,
    HEAVY_PARTITION_ROWS,
    N_PARTS,
    PIVOT_TYPES,
    _PART_BYTES,
    _bitlen_u64,
    _cents_rows,
    _count_partial_arrow,
    _encode_by_partition,
    _est_rows,
    _finalize_rollup,
    _global_ntile,
    _n_parts,
    _read_events,
    _read_points,
    _sessions_kernel,
    _streaming_gate,
    _user_key_fn,
)
from .events_codec import *      # noqa: F401,F403
from .events_windows import *    # noqa: F401,F403
from .events_tsa import *        # noqa: F401,F403
from .events_advanced import *   # noqa: F401,F403
