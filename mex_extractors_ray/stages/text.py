"""Text-analysis stages for training-data pipelines.

The reference normalizes strings per record (``get_clean_string``,
``mex/extractors/biospecimen/extract.py:94-110``; ``fix_quotes``,
``mex/extractors/datenkompass/transform.py:43-56``); these stages extend
that family to corpus-scale text analysis, each a vectorized ``map_batches``
stage (actor-pool classes where state — compiled regexes, stopword tables,
n-gram profiles — is loaded once per actor):

- token counting (whitespace + a BPE-ish regex splitter),
- quality scoring (length / punctuation / stopword ratios),
- language-ID (character-n-gram profile scoring, pure heuristic),
- document fingerprinting (rolling-hash winnowing, see hashing.py).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from mex_extractors_ray.hashing import rolling_fingerprints

# RE2-compatible (pyarrow's regex engine has no lookahead)
_BPEISH = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"

DEFAULT_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")


def token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count + BPE-ish regex token count, vectorized."""
    ws = pc.list_value_length(pc.split_pattern_regex(batch[text_col], r"\s+"))
    bpe = pc.count_substring_regex(batch[text_col], _BPEISH)
    return batch.append_column("n_words", ws.cast(pa.int64())).append_column(
        "n_bpe_tokens", bpe.cast(pa.int64())
    )


def _flat_segments(list_arr) -> tuple[np.ndarray, np.ndarray]:
    """(row index per flat item, row count) for an Arrow list array."""
    offsets = np.asarray(list_arr.offsets, dtype=np.int64)
    n = len(offsets) - 1
    return np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets)), np.asarray([n])[0]


class QualityScore:
    """Actor stage: per-doc quality features (length, punctuation ratio,
    stopword ratio, mean word length) and a composite score. The stopword
    set is compiled to an Arrow value-set once per actor; every feature is
    an Arrow/numpy kernel over the flattened word list — no per-row Python."""

    def __init__(self, text_col: str = "text", stopwords: tuple[str, ...] = DEFAULT_STOPWORDS):
        self.text_col = text_col
        self.stop_set = pa.array(list(stopwords))

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch[self.text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        # null text → "" up front: utf8_length(null)=null would round-trip
        # through NaN into an undefined int64, corrupting every feature
        text = pc.fill_null(text, "")
        n = len(text)
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        # words = runs of ASCII letters; split on the complement keeps exact
        # regexp_extract_all('[A-Za-z]+') parity (empty segments dropped)
        words = pc.split_pattern_regex(text, r"[^A-Za-z]+")
        flat = words.flatten()
        rows, _ = _flat_segments(words)
        wl = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        nonempty = wl > 0
        n_words = np.bincount(rows[nonempty], minlength=n).astype(np.int64)
        sum_wl = np.bincount(rows, weights=wl, minlength=n)
        is_stop = pc.is_in(pc.utf8_lower(flat), value_set=self.stop_set).to_numpy(
            zero_copy_only=False
        )
        n_stop = np.bincount(rows[np.asarray(is_stop, dtype=bool)], minlength=n).astype(np.int64)
        n_punct = pc.count_substring_regex(text, r"[^\w\s]").to_numpy(zero_copy_only=False).astype(np.int64)
        punct_ratio = n_punct / np.maximum(n_chars, 1)
        stop_ratio = n_stop / np.maximum(n_words, 1)
        mean_wl = np.where(n_words > 0, sum_wl / np.maximum(n_words, 1), 0.0)
        quality = (
            (np.minimum(n_words, 512) / 512.0) * 0.4
            + (1 - np.minimum(punct_ratio, 1.0)) * 0.3
            + np.minimum(stop_ratio, 0.5) * 2 * 0.3
        )
        for name, arr in (
            ("n_chars", n_chars), ("n_words", n_words), ("n_punct", n_punct),
            ("n_stop", n_stop), ("punct_ratio", punct_ratio),
            ("stop_ratio", stop_ratio), ("mean_word_len", mean_wl), ("quality", quality),
        ):
            batch = batch.append_column(name, pa.array(arr))
        return batch


class LangId:
    """Actor stage: character-bigram-profile language ID (pure heuristic, no
    external models). The per-language profiles compile ONCE per actor into
    a dense (65536, n_langs) byte-bigram weight matrix; scoring is one
    gather + one segmented reduce per batch — no per-row Python. Operates on
    UTF-8 bytes (ASCII bigrams carry the signal; multi-byte sequences fall
    outside every profile and score 0, exactly like unknown bigrams).
    Emits ``lang_pred`` + ``lang_conf``."""

    PROFILES = {
        "en": "th he in er an re on at en nd ti es or te of ed is it al ar st to nt ng se ha as ou io le ve co me de hi ri ro ic ne ea ra ce li ch ll be ma si om ur",
        "de": "en er ch de ei te in nd ie ge st ne be es un re an he au ng se it di ha al urs ic sc we ll da on ru le is me et tt rs ts zu ss",
        "fr": "es en ou de le nt et on ne qu ai ur se te re la it an ce me is el ue ra au em il ro us ar tr co ss ns ti ch ir om pa eu po",
        "es": "de es en el la os ar ue ra re er as on st ad ci io or an te do co nt se me un ti ca lo al mo po da que par ien",
    }

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.langs = list(self.PROFILES)
        w = np.zeros((1 << 16, len(self.langs)), dtype=np.float64)
        for j, lang in enumerate(self.langs):
            for i, g in enumerate(self.PROFILES[lang].split()):
                b = g.encode()
                if len(b) != 2:  # profile typos (3-char grams) can never match
                    continue
                code = (b[0] << 8) | b[1]
                if w[code, j] == 0.0:
                    w[code, j] = 1.0 / (i + 1) ** 0.5
        self.weights = w

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch[self.text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        lowered = pc.fill_null(pc.utf8_lower(text), "").combine_chunks() if isinstance(
            pc.utf8_lower(text), pa.ChunkedArray
        ) else pc.fill_null(pc.utf8_lower(text), "")
        n = len(lowered)
        buffers = lowered.buffers()
        off_dtype = np.int64 if pa.types.is_large_string(lowered.type) else np.int32
        offsets = np.frombuffer(buffers[1], dtype=off_dtype)[
            lowered.offset : lowered.offset + n + 1
        ].astype(np.int64)
        data = (
            np.frombuffer(buffers[2], dtype=np.uint8)
            if buffers[2] is not None
            else np.empty(0, np.uint8)
        )
        starts, lens = offsets[:-1], offsets[1:] - offsets[:-1]
        bl = np.maximum(lens - 1, 0)  # bigrams per row
        total = int(bl.sum())
        preds = np.full(n, "und", dtype=object)
        confs = np.zeros(n)
        if total:
            row_first = np.cumsum(bl) - bl
            local = np.arange(total, dtype=np.int64) - np.repeat(row_first, bl)
            pos = np.repeat(starts, bl) + local
            codes = (data[pos].astype(np.int32) << 8) | data[pos + 1]
            gw = self.weights[codes]  # (total, L)
            has = bl > 0
            seg_starts = row_first[has]
            scores = np.zeros((n, len(self.langs)))
            scores[has] = np.add.reduceat(gw, seg_starts, axis=0) / bl[has, None]
            tot = scores.sum(axis=1)
            best = np.argmax(scores, axis=1)
            best_s = scores[np.arange(n), best]
            nonzero = tot > 0
            confs[nonzero] = best_s[nonzero] / tot[nonzero]
            lang_arr = np.array(self.langs, dtype=object)
            preds[nonzero & (best_s > 0)] = lang_arr[best[nonzero & (best_s > 0)]]
        return batch.append_column("lang_pred", pa.array(preds, pa.string())).append_column(
            "lang_conf", pa.array(confs)
        )


def langid_sql(table: str = "documents", id_col: str = "doc_id",
               text_col: str = "text") -> str:
    """DuckDB reimplementation of :class:`LangId` — generated from the SAME
    profile spec (the :func:`vocab.vocab_sql_case` discipline), so the
    engine's heuristic becomes hash-checkable against an independent
    evaluation path.

    Exact-parity contract: valid for ASCII corpora (the scorer works on
    UTF-8 bytes, SQL ``substr`` on characters — identical iff ASCII; the
    synthetic ``documents`` table is ASCII). Tie-break mirrors
    ``np.argmax`` (first profile index wins) via ``ORDER BY s DESC,
    lang_idx ASC``; exact score ties across languages would require
    identical weight multisets (weights are 1/√(rank+1) — irrational, so
    coincidental equality is measure-zero)."""
    rows = []
    for j, lang in enumerate(LangId.PROFILES):
        seen: set = set()
        for i, g in enumerate(LangId.PROFILES[lang].split()):
            b = g.encode()
            if len(b) != 2 or b in seen:
                continue
            seen.add(b)
            w = 1.0 / (i + 1) ** 0.5
            rows.append(f"('{g}', '{lang}', {j}, {w!r})")
    values = ", ".join(rows)
    return f"""
WITH weights(g, lang, lang_idx, w) AS (VALUES {values}),
pos AS (
  SELECT d.{id_col} AS doc_id, lower(d.{text_col}) AS lt,
         length(d.{text_col}) - 1 AS nb,
         unnest(generate_series(1, length(d.{text_col}) - 1)) AS i
  FROM {table} d
),
bg AS (
  SELECT doc_id, substr(lt, i, 2) AS g, nb FROM pos
),
scores AS (
  SELECT bg.doc_id, w.lang, w.lang_idx, SUM(w.w) / ANY_VALUE(bg.nb) AS s
  FROM bg JOIN weights w ON bg.g = w.g
  GROUP BY bg.doc_id, w.lang, w.lang_idx
),
best AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s DESC, lang_idx ASC) AS rn
  FROM scores
)
SELECT d.{id_col} AS doc_id, COALESCE(b.lang, 'und') AS lang_pred
FROM {table} d LEFT JOIN best b ON d.{id_col} = b.doc_id AND b.rn = 1
"""


def fingerprint_batch(batch: pa.Table, text_col: str = "text", window: int = 16) -> pa.Table:
    """Winnowing rolling-hash fingerprint per doc (near-identity grouping
    key robust to small prefix/suffix edits)."""
    fp = rolling_fingerprints(batch[text_col], window=window)
    return batch.append_column("fingerprint", pa.array(fp.astype(np.int64)))


_M64 = "18446744073709551616"
_M32 = "4294967296"


def _mulmod_cc_sql(a: str, b: str) -> str:
    """``(a * b) mod 2^64`` for two UBIGINT expressions: split both into
    32-bit halves so every partial product stays below 2^96 (INT128-safe);
    the a1*b1 term is ≡ 0 mod 2^64 and dropped."""
    a0 = f"CAST({a} % {_M32} AS HUGEINT)"
    a1 = f"CAST({a} >> 32 AS HUGEINT)"
    b0 = f"CAST({b} % {_M32} AS HUGEINT)"
    b1 = f"CAST({b} >> 32 AS HUGEINT)"
    mid = f"((({a0} * {b1}) + ({a1} * {b0})) % {_M32}) * {_M32}"
    return f"CAST((({a0} * {b0}) + {mid}) % {_M64} AS UBIGINT)"


def _mulmod_c_sql(x: str, c: int) -> str:
    """``(x * c) mod 2^64`` for a UBIGINT expression and a constant
    (the ``shuffle._mulmod64_sql`` split-multiply)."""
    lo = f"(CAST({x} % {_M32} AS HUGEINT) * {c}) % {_M64}"
    hi = f"((CAST({x} >> 32 AS HUGEINT) * {c}) % {_M32}) * {_M32}"
    return f"CAST(({lo} + {hi}) % {_M64} AS UBIGINT)"


def fingerprint_sql(table: str = "documents", id_col: str = "doc_id",
                    text_col: str = "text", window: int = 16) -> str:
    """DuckDB reimplementation of :func:`hashing.rolling_fingerprints` —
    the ``langid_sql`` discipline: the engine's winnowing fingerprint
    becomes hash-checkable against an independent evaluation path.

    Mirrors the kernel bit-for-bit in mod-2^64 HUGEINT arithmetic
    (the ``shuffle.epoch_shuffle_sql`` precedent): ascending-power
    polynomial prefix (byte_j · 31^j), every ``window``-byte window hash,
    the splitmix64-style finalizer (``hashing._mix``), and the per-doc
    min INCLUDING the whole-string hash (the kernel seeds ``out`` with it;
    short/empty/null docs degrade to that full hash alone, null → mix(0)).
    Signed ``BIGINT`` output matches ``fingerprint_batch``'s int64 view.

    Exact-parity contract: ASCII corpora only (the kernel hashes UTF-8
    bytes, SQL ``substr``/``unicode`` work on characters — identical iff
    ASCII; the synthetic ``documents`` table is ASCII)."""
    w = window
    byte_term = _mulmod_cc_sql("y.b", "pw.p")
    return f"""
WITH RECURSIVE fp_docs AS (
  SELECT {id_col} AS doc_id, coalesce({text_col}, '') AS t FROM {table}
),
fp_pw(i, p) AS (
  SELECT 0, CAST(1 AS UBIGINT)
  UNION ALL
  SELECT i + 1, {_mulmod_c_sql('p', 31)} FROM fp_pw
  WHERE i < (SELECT coalesce(max(length(t)), 0) FROM fp_docs)
),
fp_bytes AS (
  SELECT doc_id, j,
         CAST(unicode(substr(t, CAST(j AS INT), 1)) AS UBIGINT) AS b
  FROM (SELECT doc_id, t, unnest(range(1, length(t) + 1)) AS j FROM fp_docs)
),
fp_full AS (
  SELECT d.doc_id, coalesce(s.raw, CAST(0 AS UBIGINT)) AS raw
  FROM fp_docs d
  LEFT JOIN (SELECT y.doc_id,
                    CAST(SUM(CAST({byte_term} AS HUGEINT)) % {_M64} AS UBIGINT) AS raw
             FROM fp_bytes y JOIN fp_pw pw ON pw.i = y.j - 1
             GROUP BY y.doc_id) s USING (doc_id)
),
fp_windows AS (
  SELECT s.doc_id,
         CAST(SUM(CAST({byte_term} AS HUGEINT)) % {_M64} AS UBIGINT) AS raw
  FROM (SELECT doc_id, unnest(range(1, length(t) - {w} + 2)) AS s
        FROM fp_docs WHERE length(t) >= {w}) s
  JOIN fp_bytes y ON y.doc_id = s.doc_id AND y.j >= s.s AND y.j < s.s + {w}
  JOIN fp_pw pw ON pw.i = y.j - s.s
  GROUP BY s.doc_id, s.s
),
fp_all AS (
  SELECT doc_id, raw FROM fp_full
  UNION ALL
  SELECT doc_id, raw FROM fp_windows
),
fp_mixed AS (
  SELECT doc_id, xor(m4, m4 >> 31) AS mixed
  FROM (SELECT doc_id, {_mulmod_c_sql('m3', 0x94D049BB133111EB)} AS m4
        FROM (SELECT doc_id, xor(m2, m2 >> 27) AS m3
              FROM (SELECT doc_id, {_mulmod_c_sql('m1', 0xBF58476D1CE4E5B9)} AS m2
                    FROM (SELECT doc_id, xor(raw, raw >> 30) AS m1 FROM fp_all))))
)
SELECT doc_id,
       CAST(CASE WHEN mn >= CAST(9223372036854775808 AS HUGEINT)
                 THEN CAST(mn AS HUGEINT) - {_M64}
                 ELSE CAST(mn AS HUGEINT) END AS BIGINT) AS fingerprint
FROM (SELECT doc_id, MIN(mixed) AS mn FROM fp_mixed GROUP BY doc_id)
"""


def splitmix_sql(table: str, keep_cols: str, raw_col: str = "raw",
                 out_col: str = "h") -> str:
    """Nested-SELECT splitmix64 finalizer chain (``hashing._mix`` mirror)
    over ``raw_col`` (UBIGINT) of ``table``, carrying ``keep_cols`` through —
    the shared tail of every bit-exact hash-kernel oracle
    (``string_hash_sql`` / ``fingerprint_sql`` / ``dedup.simhash_sql``)."""
    return f"""
SELECT {keep_cols}, xor(m4, m4 >> 31) AS {out_col}
FROM (SELECT {keep_cols}, {_mulmod_c_sql('m3', 0x94D049BB133111EB)} AS m4
      FROM (SELECT {keep_cols}, xor(m2, m2 >> 27) AS m3
            FROM (SELECT {keep_cols}, {_mulmod_c_sql('m1', 0xBF58476D1CE4E5B9)} AS m2
                  FROM (SELECT {keep_cols}, xor({raw_col}, {raw_col} >> 30) AS m1
                        FROM {table}))))
"""


def string_hash_sql(table: str, id_col: str, str_col: str,
                    out_col: str = "h") -> str:
    """DuckDB mirror of :func:`hashing.hash_string_array` (seed=0) — the
    ascending-power polynomial byte hash (byte_j · 31^j) followed by the
    splitmix64-style finalizer, as UBIGINT ``out_col`` per row. This is the
    hash the CDC ingest routes partitions with (``pid = h % P``), so an
    oracle built on it can check the lake's PHYSICAL layout.

    ``table`` may be any table expression (including a parenthesized
    subquery); rows must have unique ``id_col`` values (the byte explode is
    re-grouped by it). Empty/null strings hash to mix(0), matching the
    kernel. ASCII-only contract, as :func:`fingerprint_sql`."""
    byte_term = _mulmod_cc_sql("y.b", "pw.p")
    return f"""
WITH RECURSIVE hs_in AS (
  SELECT {id_col}, coalesce({str_col}, '') AS t FROM {table}
),
hs_pw(i, p) AS (
  SELECT 0, CAST(1 AS UBIGINT)
  UNION ALL
  SELECT i + 1, {_mulmod_c_sql('p', 31)} FROM hs_pw
  WHERE i < (SELECT coalesce(max(length(t)), 0) FROM hs_in)
),
hs_bytes AS (
  SELECT {id_col}, j,
         CAST(unicode(substr(t, CAST(j AS INT), 1)) AS UBIGINT) AS b
  FROM (SELECT {id_col}, t, unnest(range(1, length(t) + 1)) AS j FROM hs_in)
),
hs_raw AS (
  SELECT i.{id_col}, coalesce(s.raw, CAST(0 AS UBIGINT)) AS raw
  FROM hs_in i
  LEFT JOIN (SELECT y.{id_col},
                    CAST(SUM(CAST({byte_term} AS HUGEINT)) % {_M64} AS UBIGINT) AS raw
             FROM hs_bytes y JOIN hs_pw pw ON pw.i = y.j - 1
             GROUP BY y.{id_col}) s USING ({id_col})
)
SELECT {id_col}, xor(m4, m4 >> 31) AS {out_col}
FROM (SELECT {id_col}, {_mulmod_c_sql('m3', 0x94D049BB133111EB)} AS m4
      FROM (SELECT {id_col}, xor(m2, m2 >> 27) AS m3
            FROM (SELECT {id_col}, {_mulmod_c_sql('m1', 0xBF58476D1CE4E5B9)} AS m2
                  FROM (SELECT {id_col}, xor(raw, raw >> 30) AS m1 FROM hs_raw))))
"""


# RE2-safe DOI URL shape (the DoiStr validation analog)
DOI_URL_PATTERN = r"^https://doi\.org/10\.[0-9]{4,9}[-._;()/:A-Za-z0-9]*$"


def build_doi(batch: pa.Table, col: str, out: str = "doi",
              blocked_prefixes: tuple[str, ...] = ()) -> pa.Table:
    """Vectorized DOI/URL builder — the reference's ``get_doi``
    (``mex/extractors/endnote/transform.py:109-141``): null/blocked-prefix
    strings → null; bare ``10.…`` identifiers get the ``https://doi.org/``
    prefix; anything that then fails the DOI-URL shape validation → null.
    One pass of starts_with / if_else / match kernels, no per-row Python."""
    s = batch[col]
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    blocked = pa.array(np.zeros(len(s), dtype=bool))
    for p in blocked_prefixes:
        blocked = pc.or_(blocked, pc.fill_null(pc.starts_with(s, p), False))
    candidate = pc.if_else(
        pc.fill_null(pc.starts_with(s, "10."), False),
        pc.binary_join_element_wise(pa.scalar("https://doi.org/"), s, ""),
        s,
    )
    valid = pc.fill_null(pc.match_substring_regex(candidate, DOI_URL_PATTERN), False)
    keep = pc.and_(valid, pc.invert(blocked))
    return batch.append_column(out, pc.if_else(keep, candidate, pa.nulls(len(s), pa.string())))


# string normalizers — the reference's cleaning family, vectorized
def clean_strings(batch: pa.Table, col: str, out: str | None = None) -> pa.Table:
    """Collapse whitespace, strip, fix doubled quotes — vectorized analog of
    ``get_clean_string`` (``mex/extractors/biospecimen/extract.py:94-110``)."""
    c = batch[col]
    c = pc.replace_substring_regex(c, r"\s+", " ")
    c = pc.replace_substring(c, '""', '"')
    c = pc.utf8_trim_whitespace(c)
    if out is None:
        i = batch.column_names.index(col)
        return batch.set_column(i, col, c)
    return batch.append_column(out, c)


class RegexRedactor:
    """Actor stage: sequential regex redaction (PII scrubbing). Patterns are
    applied in order with ``pc.replace_substring_regex`` — Arrow's RE2, the
    same engine DuckDB uses, so oracle parity is exact. Compiled state
    (the pattern list) lives once per actor.

    Reference analog: per-record string scrubbing (``get_clean_string``,
    ``mex/extractors/biospecimen/extract.py:94-110``) promoted to a
    corpus-scale vectorized pass. At 100 TB this is embarrassingly parallel:
    no shuffle, CPU-bound on the RE2 scan, so size ``concurrency`` to cores.
    """

    def __init__(self, patterns: list[tuple[str, str]],
                 text_col: str = "text", out_col: str = "redacted"):
        if not patterns:
            raise ValueError("RegexRedactor: need at least one (pattern, replacement)")
        self.patterns = list(patterns)
        self.text_col, self.out_col = text_col, out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = pc.fill_null(batch[self.text_col], "")
        for pat, rep in self.patterns:
            s = pc.replace_substring_regex(s, pat, rep)
        return batch.append_column(self.out_col, s)


def redact_sql(table: str, patterns: list[tuple[str, str]],
               text_col: str = "text", out_col: str = "redacted") -> str:
    """DuckDB mirror of ``RegexRedactor`` (regexp_replace global, RE2)."""
    expr = f"COALESCE({text_col}, '')"
    for pat, rep in patterns:
        lit = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{lit}', '{rep}', 'g')"
    return f"SELECT *, {expr} AS {out_col} FROM {table}"


def repetition_features(batch: pa.Table, text_col: str = "text",
                        id_col: str = "doc_id") -> pa.Table:
    """Gopher-style within-document repetition features, fully vectorized:

    - ``n_words``: space-separated non-empty tokens,
    - ``dup_word_frac_c10k``: ``1 - distinct/total`` scaled ×10000 half-up,
    - ``top_bigram_count``: occurrences of the most frequent adjacent pair.

    Fractions are emitted as scaled ints so the DuckDB oracle hash-matches.
    Implementation: split → flatten → hash words → lexsort (row, hash) →
    run-boundary masks; bigrams are ``mix(h[i], h[i+1])`` within a row. A
    64-bit in-row hash collision would merge two distinct words; acceptable
    for a quality FILTER (collision prob per doc ≈ L²/2⁶⁴).

    One streaming pass, no shuffle — at 100 TB this runs at read speed.
    """
    from mex_extractors_ray.hashing import hash_string_array

    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = pc.fill_null(text, "")
    words = pc.split_pattern(text, " ")
    flat = words.flatten()
    offsets = np.asarray(words.offsets, dtype=np.int64)
    rows = np.repeat(np.arange(len(offsets) - 1, dtype=np.int64), np.diff(offsets))
    nonempty = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64) > 0
    h = hash_string_array(flat)[nonempty]
    rows = rows[nonempty]
    n = batch.num_rows

    n_words = np.bincount(rows, minlength=n).astype(np.int64)

    # distinct words per row: sort by (row, hash), count run starts per row
    order = np.lexsort((h, rows))
    rs, hs = rows[order], h[order]
    starts = np.ones(len(hs), dtype=bool)
    if len(hs) > 1:
        starts[1:] = (rs[1:] != rs[:-1]) | (hs[1:] != hs[:-1])
    n_distinct = np.bincount(rs[starts], minlength=n).astype(np.int64)

    with np.errstate(invalid="ignore"):
        frac = np.where(n_words > 0, 1.0 - n_distinct / np.maximum(n_words, 1), 0.0)
    dup_c10k = np.floor(frac * 10000 + 0.5).astype(np.int64)

    # adjacent bigrams within a row: pair (h[i], h[i+1]) where rows match
    adj = rows[1:] == rows[:-1] if len(rows) > 1 else np.empty(0, dtype=bool)
    with np.errstate(over="ignore"):
        bh = h[:-1][adj] * np.uint64(0x9E3779B97F4A7C15) + h[1:][adj]
    br = rows[:-1][adj]
    top = np.zeros(n, dtype=np.int64)
    if len(bh):
        order = np.lexsort((bh, br))
        rs, hs = br[order], bh[order]
        bstart = np.ones(len(hs), dtype=bool)
        bstart[1:] = (rs[1:] != rs[:-1]) | (hs[1:] != hs[:-1])
        idx = np.flatnonzero(bstart)
        runlen = np.diff(np.concatenate([idx, [len(hs)]]))
        np.maximum.at(top, rs[idx], runlen)

    ids = batch[id_col]
    return pa.table({
        id_col: ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids,
        "n_words": pa.array(n_words),
        "dup_word_frac_c10k": pa.array(dup_c10k),
        "top_bigram_count": pa.array(top),
    })


def repetition_sql(table: str = "documents", id_col: str = "doc_id",
                   text_col: str = "text") -> str:
    """DuckDB mirror of ``repetition_features`` (split on single space,
    drop empties, scaled-int fraction, max adjacent-bigram count)."""
    return f"""
WITH w AS (
  SELECT {id_col},
         list_filter(string_split(COALESCE({text_col}, ''), ' '),
                     x -> x <> '') AS l
  FROM {table}
), counts AS (
  SELECT {id_col}, len(l) AS n_words,
         len(list_distinct(l)) AS n_distinct
  FROM w
), pairs AS (
  SELECT {id_col}, unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p
  FROM w WHERE len(l) >= 2
), bi AS (
  SELECT {id_col}, MAX(c) AS top_bigram_count
  FROM (SELECT {id_col}, p, COUNT(*) AS c FROM pairs GROUP BY 1, 2)
  GROUP BY 1
)
SELECT counts.{id_col} AS {id_col},
       CAST(n_words AS BIGINT) AS n_words,
       CAST(FLOOR(CASE WHEN n_words = 0 THEN 0.0
                       ELSE 1.0 - n_distinct / n_words END * 10000 + 0.5)
            AS BIGINT) AS dup_word_frac_c10k,
       CAST(COALESCE(top_bigram_count, 0) AS BIGINT) AS top_bigram_count
FROM counts LEFT JOIN bi USING ({id_col})
"""


# ---------------------------------------------------------------------------
# TF-IDF top terms (corpus statistic × per-doc transform)
# ---------------------------------------------------------------------------

def _exploded_words(batch: pa.Table, id_col: str, text_col: str,
                    pattern: str) -> pa.Table:
    """(doc, word) rows for every non-empty word of every doc — vectorized
    flatten with the parent row index repeated per word."""
    words = pc.split_pattern(pc.fill_null(batch[text_col], ""), pattern)
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    parent = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
    flat = words.flatten()
    ids = batch[id_col].take(pa.array(parent))
    t = pa.table({id_col: ids, "word": flat})
    return t.filter(pc.greater(pc.utf8_length(t["word"]), 0))


def term_doc_frequency(ds, id_col: str = "doc_id", text_col: str = "text",
                       pattern: str = " "):
    """Document frequency per word: in how many docs does the word occur.

    Scale shape: per batch, DISTINCT (doc, word) pairs via one Arrow hash
    group_by, then ``value_counts`` over the words — the shuffle ships one
    (word, partial_df) row per distinct word per batch, never the exploded
    corpus. One small groupby-sum finalizes. Output is vocabulary-sized
    (the bounded-vocab contract, same as ``aggregates.bounded_quantiles``)."""
    def partial(b: pa.Table) -> pa.Table:
        pairs = _exploded_words(b, id_col, text_col, pattern)
        distinct = pairs.group_by([id_col, "word"]).aggregate([])
        vc = pc.value_counts(distinct["word"].combine_chunks())
        return pa.table({"word": vc.field("values"),
                         "df": vc.field("counts").cast(pa.int64())})

    # word cardinality is vocabulary-sized — exactly the many-distinct-keys
    # regime where Dataset.groupby().aggregate measured 16x slower than the
    # coarse-shuffle reduceat path (BASELINE.md round 4)
    from mex_extractors_ray.stages.aggregates import keyed_sums

    return keyed_sums(ds.map_batches(partial, batch_format="pyarrow"),
                      ["word"], ["df"])


def tfidf_topk(ds, id_col: str = "doc_id", text_col: str = "text", m: int = 5,
               pattern: str = " ", mode: str = "ppm", n_docs: int | None = None):
    """Top-m terms per document by TF-IDF — the corpus-statistic ×
    per-doc-transform composition every training-data pipeline needs
    (keyword extraction, topic hints, relevance features).

    Two stages over the same source:

    1. :func:`term_doc_frequency` (combiner + one small groupby) → the
       vocabulary-sized df table, broadcast ONCE via ``ray.put`` (zero-copy
       per task, never re-shipped per batch);
    2. a stateless per-batch pass: explode words, one Arrow hash group_by
       for tf, ``pc.index_in`` probe into the broadcast vocabulary for df,
       score, then per-doc top-m by one sort + run ordinal. A document's
       words never cross a batch boundary (one row = one doc), so NO
       shuffle is needed — the wide work is entirely in stage 1.

    ``mode='ppm'`` scores ``tf * 1_000_000 // df`` — exact integer
    arithmetic, so the DuckDB oracle matches bit-for-bit (ranking by tf/df
    is order-equivalent to tf·idf for any monotone idf). ``mode='log'``
    scores ``tf * (ln((N+1)/(df+1)) + 1)`` (requires ``n_docs``), the
    conventional smoothed variant, as float64.

    Deterministic total order: (score DESC, word ASC) per doc.
    Reference analog: the keyword fields the reference copies verbatim
    (``mex/extractors/datscha_web/models/item.py`` keywords) — here they
    are COMPUTED from the corpus."""
    import ray

    if mode not in ("ppm", "log"):
        raise ValueError(f"tfidf_topk: unknown mode {mode!r}")
    if mode == "log" and not n_docs:
        raise ValueError("tfidf_topk: mode='log' requires n_docs")

    df_rows = term_doc_frequency(ds, id_col, text_col, pattern).take_all()
    vocab = pa.array([r["word"] for r in df_rows], pa.string())
    dfs = np.array([r["df"] for r in df_rows], dtype=np.int64)
    ref = ray.put({"vocab": vocab, "df": dfs})

    def score_batch(b: pa.Table) -> pa.Table:
        from mex_extractors_ray.stages.dedup import _run_starts

        pair = ray.get(ref)
        pairs = _exploded_words(b, id_col, text_col, pattern)
        tf = pairs.group_by([id_col, "word"]).aggregate([([], "count_all")])
        tf = tf.rename_columns([id_col, "word", "tf"])
        idx = pc.index_in(tf["word"], value_set=pair["vocab"])
        df = pair["df"][idx.combine_chunks().to_numpy(zero_copy_only=False)]
        tf_np = tf["tf"].combine_chunks().to_numpy(zero_copy_only=False)
        if mode == "ppm":
            score = pa.array(tf_np * 1_000_000 // df, pa.int64())
        else:
            idf = np.log((n_docs + 1.0) / (df + 1.0)) + 1.0
            score = pa.array(tf_np * idf, pa.float64())
        t = pa.table({
            id_col: tf[id_col], "word": tf["word"],
            "tf": tf["tf"].combine_chunks().cast(pa.int64()), "score": score,
        }).sort_by([(id_col, "ascending"), ("score", "descending"),
                    ("word", "ascending")])
        n = t.num_rows
        if n == 0:
            return t.append_column("rank", pa.array([], pa.int64()))
        starts = np.flatnonzero(_run_starts(t[id_col]))
        counts = np.diff(np.append(starts, n))
        ordinal = np.arange(n, dtype=np.int64) - np.repeat(starts, counts) + 1
        t = t.append_column("rank", pa.array(ordinal))
        return t.filter(pa.array(ordinal <= m))

    return ds.map_batches(score_batch, batch_format="pyarrow")


def tfidf_sql(table: str = "documents", id_col: str = "doc_id",
              text_col: str = "text", m: int = 5) -> str:
    """DuckDB mirror of ``tfidf_topk(mode='ppm')``."""
    return f"""
WITH w AS (
  SELECT {id_col}, unnest(list_filter(
           string_split(COALESCE({text_col}, ''), ' '), x -> x <> '')) AS word
  FROM {table}
), tf AS (
  SELECT {id_col}, word, COUNT(*) AS tf FROM w GROUP BY 1, 2
), df AS (
  SELECT word, COUNT(DISTINCT {id_col}) AS df FROM w GROUP BY 1
), scored AS (
  SELECT tf.{id_col} AS {id_col}, tf.word AS word, tf.tf AS tf,
         tf.tf * 1000000 // df.df AS score,
         row_number() OVER (PARTITION BY tf.{id_col}
                            ORDER BY tf.tf * 1000000 // df.df DESC,
                                     tf.word ASC) AS rank
  FROM tf JOIN df USING (word)
)
SELECT {id_col}, word, CAST(tf AS BIGINT) AS tf, CAST(score AS BIGINT) AS score,
       CAST(rank AS BIGINT) AS rank
FROM scored WHERE rank <= {m}
"""


def token_concentration(ds, text_col: str = "text", id_col: str = "doc_id",
                        out_col: str = "conc_c6"):
    """Simpson token-concentration per doc — a repetition/quality signal
    for training-data gating: conc = Σ_t tf² / dlen² in [1/dlen, 1]
    (1 = one token repeated, 1/dlen = all distinct), emitted as the EXACT
    integer ``(1_000_000 · Σtf²) // dlen²`` so the SQL oracle's BIGINT
    floor-division matches bit-for-bit (no float anywhere — the rational
    cousin of entropy, which would need a log and lose oracle parity).
    Empty/null docs are dropped (dlen = 0 has no concentration). One
    vectorized pass per batch, no shuffle."""
    import pyarrow.compute as _pc

    def batch(t: pa.Table) -> pa.Table:
        words = _pc.split_pattern(_pc.fill_null(t[text_col], ""), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        offsets = np.asarray(words.offsets, dtype=np.int64)
        rows = np.repeat(np.arange(len(offsets) - 1, dtype=np.int64),
                         np.diff(offsets))
        keep = np.asarray(_pc.greater(_pc.utf8_length(flat), 0)
                          .to_numpy(zero_copy_only=False), dtype=bool)
        r = rows[keep]
        n = t.num_rows
        occ = pa.table({"_row": pa.array(r), "token": flat.filter(pa.array(keep))})
        g = occ.group_by(["_row", "token"]).aggregate([("token", "count")])
        gr = np.asarray(g["_row"].combine_chunks(), dtype=np.int64)
        tf = np.asarray(g["token_count"].combine_chunks(), dtype=np.int64)
        s2 = np.zeros(n, dtype=np.int64)
        np.add.at(s2, gr, tf * tf)
        dlen = np.bincount(r, minlength=n).astype(np.int64)
        mask = dlen > 0
        conc = (1_000_000 * s2[mask]) // (dlen[mask] * dlen[mask])
        ids = t[id_col]
        ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
        return pa.table({id_col: ids.filter(pa.array(mask)),
                         out_col: pa.array(conc)})

    return ds.map_batches(batch, batch_format="pyarrow")


def bigram_pmi_topk(ds, text_col: str = "text", min_count: int = 5,
                    k: int = 30, num_partitions: int = 32):
    """Top-k collocations by pointwise mutual information, exact-integer:
    ``pmi_c6 = (1e6 · N · c_xy) // (c_x · c_y)`` (the monotone exp-PMI —
    no log, so the SQL oracle's BIGINT arithmetic matches bit-for-bit;
    see ``bm25_topk`` for the float-parity rationale). Bigrams are
    adjacent KEPT tokens within a doc.

    Scale shape: ONE exchange — the per-batch combiner emits bigram,
    unigram and total counts as one keyed stream (kind ∈ b/u/n), summed
    by ``keyed_sums``; unigram counts are vocabulary-bounded and
    broadcast into the vectorized PMI map (the TF-IDF df discipline);
    the final sort is over count-filtered bigrams only. Raises if the
    integer products could exceed int64 (N·c_xy·1e6 < 2^62) — rescale
    per shard beyond that."""
    import pyarrow.compute as _pc

    from mex_extractors_ray.stages.aggregates import keyed_sums

    def partial(t: pa.Table) -> pa.Table:
        words = _pc.split_pattern(_pc.fill_null(t[text_col], ""), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        offsets = np.asarray(words.offsets, dtype=np.int64)
        rows = np.repeat(np.arange(len(offsets) - 1, dtype=np.int64),
                         np.diff(offsets))
        keep = np.asarray(_pc.greater(_pc.utf8_length(flat), 0)
                          .to_numpy(zero_copy_only=False), dtype=bool)
        kept_idx = np.flatnonzero(keep)
        r = rows[keep]
        adj = r[1:] == r[:-1] if len(r) else np.zeros(0, bool)
        xi, yi = kept_idx[:-1][adj], kept_idx[1:][adj]
        bg = pa.table({
            "x": flat.take(pa.array(xi)), "y": flat.take(pa.array(yi)),
        }).group_by(["x", "y"]).aggregate([("y", "count")])
        un = pa.table({"w": flat.take(pa.array(kept_idx))}).group_by(
            ["w"]).aggregate([("w", "count")])
        n_b, n_u = bg.num_rows, un.num_rows
        return pa.table({
            "kind": pa.array(["b"] * n_b + ["u"] * n_u + ["n"]),
            "x": pa.concat_arrays([bg["x"].combine_chunks(),
                                   un["w"].combine_chunks(),
                                   pa.array([""], pa.string())]),
            "y": pa.concat_arrays([bg["y"].combine_chunks(),
                                   pa.array([""] * (n_u + 1), pa.string())]),
            "c": pa.concat_arrays([
                bg["y_count"].combine_chunks().cast(pa.int64()),
                un["w_count"].combine_chunks().cast(pa.int64()),
                pa.array([int(len(kept_idx))], pa.int64())]),
        })

    agg = keyed_sums(ds.map_batches(partial, batch_format="pyarrow"),
                     ["kind", "x", "y"], ["c"],
                     num_partitions=num_partitions)
    # unigrams + N: vocabulary-bounded driver state (the TF-IDF broadcast
    # discipline); bigrams stay distributed for the PMI map + top-k sort
    small = agg.filter(expr="kind != 'b'").take_all()
    total = sum(r["c"] for r in small if r["kind"] == "n")
    uni = sorted((r["x"], r["c"]) for r in small if r["kind"] == "u")
    vocab = np.array([w for w, _ in uni], dtype=object)
    counts = np.array([c for _, c in uni], dtype=np.int64)
    if total and 1_000_000 * total >= (1 << 62) // max(1, int(counts.max())):
        raise ValueError("bigram_pmi_topk: int64 PMI products would "
                         "overflow at this corpus size; compute per shard")

    def pmi(t: pa.Table) -> pa.Table:
        t = t.filter(_pc.greater_equal(t["c"], min_count))
        if t.num_rows == 0:
            return pa.table({"x": pa.array([], pa.string()),
                             "y": pa.array([], pa.string()),
                             "n_xy": pa.array([], pa.int64()),
                             "pmi_c6": pa.array([], pa.int64())})
        xs = t["x"].combine_chunks().to_numpy(zero_copy_only=False)
        ys = t["y"].combine_chunks().to_numpy(zero_copy_only=False)
        c_xy = np.asarray(t["c"].combine_chunks(), dtype=np.int64)
        c_x = counts[np.searchsorted(vocab, xs)]
        c_y = counts[np.searchsorted(vocab, ys)]
        pmi_c6 = (1_000_000 * total * c_xy) // (c_x * c_y)
        return pa.table({"x": t["x"], "y": t["y"],
                         "n_xy": pa.array(c_xy),
                         "pmi_c6": pa.array(pmi_c6)})

    scored = agg.filter(expr="kind == 'b'").map_batches(
        pmi, batch_format="pyarrow")
    return scored.sort(["pmi_c6", "x", "y"],
                       descending=[True, False, False]).limit(k)
