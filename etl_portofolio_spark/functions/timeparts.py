"""Time/date derivations (SURVEY.md §2.7 F4–F12, §2.5 A3).

Reference behaviours covered:

- minute bucketing: ``DATE_FORMAT(FROM_UNIXTIME(clock),'YYYY-MM-dd HH:mm:00')``
  (``Processing Data.py:171``) — the reference's ``YYYY`` is *week-year*, a
  latent cross-new-year bug (SURVEY §2.11.6); this engine deliberately uses
  calendar-year truncation via ``date_trunc('minute', ts)``.
- UTC+7 shift: ``ts + INTERVAL 7 HOURS`` (``Ingestion Data (XML).py:141``,
  ``Processing Data.py:209``) and ``clock + 7*3600`` epoch math
  (``Ingestion Data (MySQL).py:173``) — generalised to a parameter.
- string date-parts sliced out of a formatted timestamp
  (``Ingestion Data (XML).py:143-148``, ``Processing Data.py:212-214``) —
  produced with ``date_format`` directly instead of format-then-substring;
  same outputs, one pass.
- ``ds`` partition key ``yyyyMMdd`` (``Ingestion Data (MySQL).py:173``).

All pure Column expressions — codegen-friendly, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: The reference hardcodes Asia/Jakarta as a +7h wall-clock shift.
DEFAULT_TZ_OFFSET_HOURS = 7


def minute_bucket(ts: Column | str) -> Column:
    """Truncate a timestamp to its minute (reference's pivot/join grain)."""
    return F.date_trunc("minute", ts)


def shift_hours(ts: Column | str, hours: int = DEFAULT_TZ_OFFSET_HOURS) -> Column:
    """``ts + INTERVAL {hours} HOURS`` — the reference's UTC→local shift."""
    col = F.col(ts) if isinstance(ts, str) else ts
    return col + F.expr(f"INTERVAL {int(hours)} HOURS")


def epoch_to_ts_utc7(epoch: Column | str, hours: int = DEFAULT_TZ_OFFSET_HOURS) -> Column:
    """Epoch seconds + offset → timestamp (``Ingestion Data (MySQL).py:173``)."""
    col = F.col(epoch) if isinstance(epoch, str) else epoch
    return F.timestamp_seconds(col + F.lit(int(hours) * 3600))


def ds_from_ts(ts: Column | str) -> Column:
    """``yyyyMMdd`` string partition key from a timestamp."""
    return F.date_format(ts, "yyyyMMdd")


def date_parts(ts: Column | str) -> dict[str, Column]:
    """String date parts matching the reference's substring-sliced outputs.

    ``Ingestion Data (XML).py:143-148`` slices waktu_string/tahun/bulan/
    tanggal/jam/menit out of ``dd-MM-yyyy HH:mm:ss``; emitted here via
    direct ``date_format`` (identical values, no intermediate column).
    """
    return {
        "waktu_string": F.date_format(ts, "dd-MM-yyyy HH:mm:ss"),
        "tahun": F.date_format(ts, "yyyy"),
        "bulan": F.date_format(ts, "MM"),
        "tanggal": F.date_format(ts, "dd"),
        "jam": F.date_format(ts, "HH"),
        "menit": F.date_format(ts, "mm"),
    }
