"""Trade backfill (SURVEY.md §2.3 T6): repair sequence gaps by fetching
missed trades from a REST source and appending them with
``backfilled=True``.

Reproduces the reference's async backfiller semantics
(/root/reference/redis_worker.py:42-94): page backwards with an ``after``
cursor, 100 trades per request, bounded request count, set-difference
bookkeeping of filled vs still-missing ids, audit logging of anything
unrecoverable. The REST client is pluggable (tests inject a canned
fetcher; a live deployment wires a ccxt-style client).

Where it runs: inside ``foreachBatch`` after the micro-batch's trades are
written — gap records are small (they're ranges, not rows), so collecting
them to the driver and fetching there matches the reference's design while
keeping executors free. At very high gap volume the same fetcher can be
mapped over executors with ``mapInPandas``.
"""

from __future__ import annotations

import logging
import math
from typing import Callable, Iterable

logger = logging.getLogger("fictional_guacamole_spark.backfill")

PAGE_SIZE = 100          # trades per request (redis_worker.py:46)

# fetcher(product_id, after_id) -> list of trade dicts with at least
# {"trade_id": int, "price": str, "volume": str, "side": str,
#  "exchange_ts": datetime|None}
Fetcher = Callable[[str, int], list[dict]]


def backfill_gaps(gaps: Iterable[dict], fetcher: Fetcher) -> list[dict]:
    """Fetch all missing trades for the given gap records.

    Each gap is {"product_id", "gap_first_id", "gap_last_id"}. Pages with
    an ``after`` cursor at most ceil(missing/PAGE_SIZE) times per gap
    (the reference's ``recursive_count`` bound, redis_worker.py:46,50,82);
    ids that never arrive are logged at CRITICAL (redis_worker.py:85-91).
    """
    repaired: list[dict] = []
    for gap in gaps:
        product = gap["product_id"]
        first, last = int(gap["gap_first_id"]), int(gap["gap_last_id"])
        missing = set(range(first, last + 1))
        max_requests = max(1, math.ceil(len(missing) / PAGE_SIZE))
        cursor = last + 1
        for _ in range(max_requests):
            if not missing:
                break
            page = fetcher(product, cursor)
            if not page:
                break
            for trade in page:
                tid = int(trade["trade_id"])
                if tid in missing:
                    missing.discard(tid)
                    repaired.append({
                        "out_type": "trade", "product_id": product,
                        "trade_id": tid,
                        "sequence": None,       # redis_worker.py:67
                        "price": str(trade.get("price")),
                        "volume": str(trade.get("volume")),
                        "side": trade.get("side"),
                        "server_ts": trade.get("server_ts"),
                        "exchange_ts": trade.get("exchange_ts"),
                        "backfilled": True,      # redis_worker.py:66
                    })
            cursor = min(t["trade_id"] for t in page)
        if missing:
            logger.critical(
                "backfill incomplete for %s: %d ids unrecovered (%s)",
                product, len(missing), sorted(missing)[:10])
    return repaired
