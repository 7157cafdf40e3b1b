"""Exchange-frame parsing: raw JSON text → normalized FRAME_SCHEMA rows.

Covers the reference's parse/dispatch/flatten/projection/decode operators
(SURVEY.md §2.2 P1–P7) as pure JVM-side expressions — `from_json`,
`get_json_object`, `explode`, `when` — no Python in the parse path, so at
cluster scale parsing runs inside whole-stage codegen at source speed.

Two dialects:

- **GDAX** (/root/reference/real_guac.py:37-102): flat JSON objects with a
  ``type`` discriminator (`snapshot` | `l2update` | `match`).
- **Poloniex** (/root/reference/polo_ws.py:35-116, protocol documented at
  :143-165): positional frames ``[channel_id, seq, [messages...]]`` where
  each message is itself heterogeneous (``'i'`` book snapshot with
  price→volume JSON maps, ``'o'`` order delta, ``'t'`` trade). The
  heterogeneous arrays are captured losslessly by parsing to
  ``array<string>`` (Spark renders non-string elements as their raw JSON
  text), then dispatching per message kind. (Spark 4's VARIANT type handles
  this equally well; the string form keeps the path fully codegen-compatible.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fictional_guacamole_spark.operators.book import FRAME_SCHEMA

# GDAX message envelope (real_guac.py subscribe contract at :142-146).
GDAX_MSG_SCHEMA = (
    "type string, product_id string, "
    "bids array<array<string>>, asks array<array<string>>, "
    "changes array<array<string>>, "
    "time string, sequence long, trade_id long, "
    "price string, size string, side string"
)


def _frame_cols(seq: Column, server_ts: Column, product_id: Column,
                msg_type: Column, bids: Column, asks: Column, changes: Column,
                trade_id: Column, sequence: Column, price: Column,
                volume: Column, side: Column, exchange_ts: Column) -> list[Column]:
    return [seq.cast("long").alias("seq"),
            server_ts.alias("server_ts"),
            product_id.alias("product_id"),
            msg_type.alias("msg_type"),
            bids.alias("bids"), asks.alias("asks"), changes.alias("changes"),
            trade_id.cast("long").alias("trade_id"),
            sequence.cast("long").alias("sequence"),
            price.alias("price"), volume.alias("volume"), side.alias("side"),
            exchange_ts.alias("exchange_ts")]


def parse_gdax_frames(raw: DataFrame, value_col: str = "value",
                      seq_col: str = "seq") -> DataFrame:
    """GDAX JSON frames → FRAME_SCHEMA.

    P1 json parse, P2 type dispatch, P4 projection/rename (size→volume),
    P6 server timestamp, P7 malformed-frame drop (from_json yields null →
    filtered). Unknown message types pass through the filter and are
    dropped by the kernel's dispatch, mirroring the reference's silent
    drop.
    """
    m = F.from_json(F.col(value_col), GDAX_MSG_SCHEMA)
    parsed = raw.select(
        *_frame_cols(
            seq=F.col(seq_col),
            server_ts=F.coalesce(
                F.to_timestamp(m["time"], "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]'Z'"),
                F.current_timestamp()),
            product_id=m["product_id"],
            msg_type=m["type"],
            bids=m["bids"], asks=m["asks"], changes=m["changes"],
            trade_id=m["trade_id"], sequence=m["sequence"],
            price=m["price"], volume=m["size"],
            side=m["side"],
            exchange_ts=F.to_timestamp(m["time"],
                                       "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]'Z'"),
        ),
        m["type"].alias("_type"),
    )
    return (parsed.filter(F.col("_type").isNotNull())
            .drop("_type"))


# --- Poloniex --------------------------------------------------------------

def _polo_side(code: Column) -> Column:
    """Poloniex 1=bid/buy, 0=ask/sell (polo_ws.py:57, :100)."""
    return F.when(code == "1", F.lit("buy")).otherwise(F.lit("sell"))


def _book_pairs(map_json: Column) -> Column:
    """Price→volume JSON object → array of [price, volume] pairs."""
    entries = F.map_entries(F.from_json(map_json, "map<string,string>"))
    return F.transform(entries, lambda e: F.array(e["key"], e["value"]))


def parse_polo_frames(raw: DataFrame, value_col: str = "value",
                      seq_col: str = "seq",
                      channel_map: dict[str, str] | None = None) -> DataFrame:
    """Poloniex positional frames → FRAME_SCHEMA.

    P3 flatten: one frame carries many messages (`for message in msg[2]`,
    polo_ws.py:38) → posexplode keeps intra-frame order in the kernel's
    seq (frame_seq * 2^20 + position); heartbeat frames (no messages) drop
    out via explode of an empty array.

    Channel-id→pair resolution (the reference builds this map from
    snapshots at polo_ws.py:48):

    - ``channel_map`` given (streaming mode): resolved with a literal
      ``create_map`` — zero joins, pure codegen. The subscriber knows the
      pairs it subscribed (the subscribe packet names them — polo_ws.py:
      121-128) and Poloniex channel ids are published constants, so a
      static map is the faithful model.
    - ``channel_map`` omitted (batch replay/analytics): the mapping is
      learned from the capture's own snapshots via a broadcast join of
      the distinct (channel, pair) set. (A stream can't self-join this
      way — Spark correctly rejects the unbounded stream-stream join.)
    """
    channel = F.get_json_object(F.col(value_col), "$[0]")
    proto_seq = F.get_json_object(F.col(value_col), "$[1]").cast("long")
    msgs = F.from_json(F.get_json_object(F.col(value_col), "$[2]"),
                       "array<string>")
    exploded = (
        raw.select(F.col(seq_col).cast("long").alias("frame_seq"),
                   channel.alias("channel"),
                   proto_seq.alias("proto_seq"),
                   F.posexplode_outer(msgs).alias("pos", "m"))
        .filter(F.col("m").isNotNull())
    )
    kind = F.get_json_object("m", "$[0]")
    pair_from_snapshot = F.get_json_object("m", "$[1].currencyPair")

    with_kind = exploded.select(
        "frame_seq", "channel", "proto_seq", "pos", "m", kind.alias("kind"),
        pair_from_snapshot.alias("snap_pair"))

    if channel_map is not None:
        lit_map = F.create_map(
            *[F.lit(x) for pair in channel_map.items() for x in pair])
        resolved = with_kind.withColumn(
            "pair", F.element_at(lit_map, F.col("channel")))
    else:
        chan_map = (with_kind.filter(F.col("kind") == "i")
                    .select("channel", F.col("snap_pair").alias("pair"))
                    .distinct())
        resolved = with_kind.join(F.broadcast(chan_map), "channel", "left")

    seq = F.col("frame_seq") * (1 << 20) + F.col("pos")
    # polo epoch seconds → UTC timestamp (polo_ws.py:94 equivalent)
    trade_ts = F.to_timestamp(F.from_unixtime(
        F.get_json_object("m", "$[5]").cast("long")))

    return resolved.select(
        *_frame_cols(
            seq=seq,
            server_ts=F.coalesce(trade_ts, F.current_timestamp()),
            product_id=F.coalesce(F.col("snap_pair"), F.col("pair")),
            msg_type=F.when(F.col("kind") == "i", "snapshot")
                      .when(F.col("kind") == "o", "l2update")
                      .when(F.col("kind") == "t", "match"),
            # orderBook arrives [asks_map, bids_map] (polo_ws.py:41-44)
            bids=_book_pairs(F.get_json_object("m", "$[1].orderBook[1]")),
            asks=_book_pairs(F.get_json_object("m", "$[1].orderBook[0]")),
            changes=F.when(
                F.col("kind") == "o",
                F.array(F.array(
                    _polo_side(F.get_json_object("m", "$[1]")),
                    F.get_json_object("m", "$[2]"),
                    F.get_json_object("m", "$[3]")))),
            # trade fields only populated for 't' messages; 'o' reuses the
            # same positions for side/price/qty (protocol, polo_ws.py:143-165)
            trade_id=F.when(F.col("kind") == "t",
                            F.get_json_object("m", "$[1]")),
            sequence=F.col("proto_seq"),
            price=F.when(F.col("kind") == "t", F.get_json_object("m", "$[3]")),
            volume=F.when(F.col("kind") == "t", F.get_json_object("m", "$[4]")),
            side=F.when(F.col("kind") == "t",
                        _polo_side(F.get_json_object("m", "$[2]"))),
            exchange_ts=trade_ts,
        )
    ).filter(F.col("msg_type").isNotNull() & F.col("product_id").isNotNull())


def ensure_frame_schema(df: DataFrame) -> DataFrame:
    """Project/cast any parsed frame DataFrame onto exact FRAME_SCHEMA."""
    return df.select(*[
        F.col(f.name).cast(f.dataType).alias(f.name)
        for f in FRAME_SCHEMA.fields
    ])
