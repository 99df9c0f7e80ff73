"""Deterministic stratified sampling for training-data curation
(per-language / per-domain "temperature" sampling a la public LLM corpus
recipes): keep a row iff a salted md5 hash of its id, mapped to [0, 1),
falls below the stratum's fraction.

Hash-based (not Bernoulli-RNG) on purpose:
- exactly reproducible across runs, partitionings, and engines — the
  DuckDB oracle states the identical predicate, and a resumed/re-run job
  keeps the same rows (seeded `DataFrame.sample` is only stable for a
  fixed partitioning);
- map-only: a pure JVM expression, no shuffle, no Python, trivially
  correct at any corpus size;
- stable under corpus growth: a doc's keep/drop never changes when other
  docs arrive (hash of its own id only).

u(id) = int(md5(salt || '#' || id)[:15 hex], 16) / 2^60  — the same
15-hex-char construction the simhash operator pins (fits a signed 64-bit
integer in both engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = "lss-sample-v1"
_HEX_CHARS = 15          # 60 bits; ('0x'||...)::BIGINT-safe in DuckDB too
_DENOM = float(1 << 60)


def sample_unit(id_col: Column | str, salt: str = DEFAULT_SALT) -> Column:
    """Uniform-[0,1) deterministic hash of (salt, id) — the sampling
    coordinate. Exposed so oracles/tests can state the identical rule."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.md5(F.concat(F.lit(salt + "#"), c.cast("string")))
    return (F.conv(F.substring(h, 1, _HEX_CHARS), 16, 10).cast("double")
            / F.lit(_DENOM))


def stratified_sample(docs: DataFrame, fractions: dict[str, float],
                      strata_col: str = "lang", id_col: str = "doc_id",
                      default_fraction: float = 0.0,
                      salt: str = DEFAULT_SALT) -> DataFrame:
    """Keep each row iff sample_unit(id) < fractions[stratum] (strata not
    in ``fractions`` use ``default_fraction``). Expected kept fraction per
    stratum equals its configured rate; selection is deterministic and
    independent across rows. Map-only — no shuffle, no Python.

    The rate lookup is a single map literal (flat expression regardless
    of strata count — a per-domain dict with 10k entries must not become
    a 10k-deep CASE chain that blows codegen limits)."""
    if fractions:
        kv = []
        for k in sorted(fractions):
            kv += [F.lit(k), F.lit(float(fractions[k]))]
        rate = F.coalesce(F.element_at(F.create_map(*kv), F.col(strata_col)),
                          F.lit(float(default_fraction)))
    else:
        rate = F.lit(float(default_fraction))
    return docs.where(sample_unit(id_col, salt) < rate)


def sample_unit_sql(id_expr: str, salt: str = DEFAULT_SALT) -> str:
    """DuckDB expression identical to ``sample_unit`` (for oracles)."""
    return (f"(('0x' || substr(md5('{salt}#' || ({id_expr})::VARCHAR), 1, "
            f"{_HEX_CHARS}))::BIGINT / {_DENOM})")
