"""PII detection and redaction — the data-cleaning stage every LLM training
pipeline runs before anything else ships.

Detection/redaction is pure RE2 on BOTH sides (pyarrow's
``count_substring_regex`` / ``replace_substring_regex`` and DuckDB's
``regexp_extract_all`` / ``regexp_replace`` are all RE2), so counts and the
redacted strings themselves are bit-reproducible in SQL.

The shared test corpus contains no PII, so the driver entry first ATTACHES
deterministic synthetic PII (emails + IPv4s derived from ``doc_id``, the same
disclosed-fake pattern as :mod:`.multimodal`'s image codec) — the scrub stage
then has real signal and its SQL twin replicates the attachment with string
concatenation.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"(?:[0-9]{1,3}\.){3}[0-9]{1,3}"


def attach_fake_pii(ds, *, text_col: str = "text", id_col: str = "doc_id",
                    every: int = 3):
    """Append a deterministic contact line to every ``every``-th doc:
    ``' contact u<id>@ex.com ip 10.0.<id%256>.<id%100>'``."""
    import functools

    return ds.map_batches(
        functools.partial(
            attach_fake_pii_batch, text_col=text_col, id_col=id_col, every=every
        ),
        batch_format="pyarrow",
    )


def attach_fake_pii_batch(batch: pa.Table, *, text_col: str = "text",
                          id_col: str = "doc_id", every: int = 3) -> pa.Table:
    """Batch-level form of :func:`attach_fake_pii` (composable inside fused
    stages)."""

    def attach(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        ids64 = pc.cast(ids, pa.int64())
        suffix = pc.binary_join_element_wise(
            " contact u", pc.cast(ids, pa.string()),
            "@ex.com ip 10.0.",
            pc.cast(pc.subtract(ids64, pc.multiply(pc.divide(ids64, 256), 256)), pa.string()),
            ".",
            pc.cast(pc.subtract(ids64, pc.multiply(pc.divide(ids64, 100), 100)), pa.string()),
            "",
        )
        keep = pc.equal(
            pc.subtract(ids64, pc.multiply(pc.divide(ids64, every), every)), 0
        )
        text = pc.fill_null(batch[text_col], "")
        new = pc.if_else(keep, pc.binary_join_element_wise(text, suffix, ""), text)
        return batch.set_column(
            batch.column_names.index(text_col), text_col, new
        )

    return attach(batch)


def pii_scrub(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """(id, n_emails, n_ips, redacted): per-doc PII match counts and the text
    with emails then IPv4s replaced by ``[EMAIL]`` / ``[IP]`` — one vectorized
    RE2 kernel per pattern per batch."""

    def scrub(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch[text_col], "")
        n_em = pc.cast(pc.count_substring_regex(text, EMAIL_RE), pa.int64())
        n_ip = pc.cast(pc.count_substring_regex(text, IPV4_RE), pa.int64())
        red = pc.replace_substring_regex(text, EMAIL_RE, "[EMAIL]")
        red = pc.replace_substring_regex(red, IPV4_RE, "[IP]")
        return pa.table(
            {
                id_col: batch[id_col],
                "n_emails": n_em,
                "n_ips": n_ip,
                "redacted": red,
            }
        )

    return ds.map_batches(scrub, batch_format="pyarrow")


def pii_scrub_sql(*, table: str = "documents", text_col: str = "text",
                  id_col: str = "doc_id", every: int = 3) -> str:
    """SQL twin: replicate the deterministic attachment, then count/redact
    with the same RE2 patterns."""
    email = EMAIL_RE.replace("'", "''")
    ipv4 = IPV4_RE.replace("'", "''")
    attach = (
        f"CASE WHEN {id_col} % {every} = 0 THEN coalesce({text_col}, '') "
        f"|| ' contact u' || {id_col} || '@ex.com ip 10.0.' "
        f"|| ({id_col} % 256) || '.' || ({id_col} % 100) "
        f"ELSE coalesce({text_col}, '') END"
    )
    return f"""WITH pii AS (SELECT {id_col}, {attach} AS t FROM {table})
SELECT {id_col},
       CAST(len(regexp_extract_all(t, '{email}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{ipv4}')) AS BIGINT) AS n_ips,
       regexp_replace(regexp_replace(t, '{email}', '[EMAIL]', 'g'),
                      '{ipv4}', '[IP]', 'g') AS redacted
FROM pii"""
