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


class QualityScore:
    """Actor stage: per-doc quality features (length, punctuation ratio,
    stopword ratio, mean word length) and a composite score. Regexes are
    compiled once per actor."""

    def __init__(self, text_col: str = "text", stopwords: tuple[str, ...] = DEFAULT_STOPWORDS):
        self.text_col = text_col
        self.stopwords = set(stopwords)
        self.punct = re.compile(r"[^\w\s]")
        self.word = re.compile(r"[A-Za-z]+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[self.text_col]
        n_chars = text.str.len().astype("int64")
        words = text.str.findall(self.word)
        n_words = words.str.len().astype("int64")
        n_punct = text.str.count(self.punct).astype("int64")
        stop = self.stopwords
        n_stop = words.map(lambda ws: sum(1 for w in ws if w.lower() in stop)).astype("int64")
        mean_wl = np.where(n_words > 0, words.map(lambda ws: sum(map(len, ws))) / n_words.clip(lower=1), 0.0)
        batch = batch.assign(
            n_chars=n_chars,
            n_words=n_words,
            n_punct=n_punct,
            n_stop=n_stop,
            punct_ratio=n_punct / n_chars.clip(lower=1),
            stop_ratio=n_stop / n_words.clip(lower=1),
            mean_word_len=mean_wl,
        )
        batch["quality"] = (
            (batch["n_words"].clip(upper=512) / 512.0) * 0.4
            + (1 - batch["punct_ratio"].clip(upper=1.0)) * 0.3
            + batch["stop_ratio"].clip(upper=0.5) * 2 * 0.3
        )
        return batch


class LangId:
    """Actor stage: character-bigram-profile language ID (pure heuristic, no
    external models). Profiles are tiny per-language bigram frequency tables
    built once per actor; scoring is a vectorized bag-of-bigrams dot
    product. Emits ``lang_pred`` + ``lang_conf``."""

    PROFILES = {
        "en": "th he in er an re on at en nd ti es or te of ed is it al ar st to nt ng se ha as ou io le ve co me de hi ri ro ic ne ea ra ce li ch ll be ma si om ur",
        "de": "en er ch de ei te in nd ie ge st ne be es un re an he au ng se it di ha al urs ic sc we ll da on ru le is me et tt rs ts zu ss",
        "fr": "es en ou de le nt et on ne qu ai ur se te re la it an ce me is el ue ra au em il ro us ar tr co ss ns ti ch ir om pa eu po",
        "es": "de es en el la os ar ue ra re er as on st ad ci io or an te do co nt se me un ti ca lo al mo po da que par ien",
    }

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.tables: dict[str, dict[str, float]] = {}
        for lang, prof in self.PROFILES.items():
            grams = prof.split()
            self.tables[lang] = {g: 1.0 / (i + 1) ** 0.5 for i, g in enumerate(grams)}

    def _score(self, text: str) -> tuple[str, float]:
        t = text.lower()
        grams = [t[i : i + 2] for i in range(len(t) - 1)]
        if not grams:
            return "und", 0.0
        best, best_s, total = "und", 0.0, 0.0
        for lang, table in self.tables.items():
            s = sum(table.get(g, 0.0) for g in grams) / len(grams)
            total += s
            if s > best_s:
                best, best_s = lang, s
        conf = best_s / total if total else 0.0
        return best, conf

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        scored = batch[self.text_col].map(self._score)
        batch = batch.assign(
            lang_pred=scored.map(lambda x: x[0]), lang_conf=scored.map(lambda x: x[1])
        )
        return batch


def fingerprint_batch(batch: pa.Table, text_col: str = "text", window: int = 16) -> pa.Table:
    """Winnowing rolling-hash fingerprint per doc (near-identity grouping
    key robust to small prefix/suffix edits)."""
    fp = rolling_fingerprints(batch[text_col], window=window)
    return batch.append_column("fingerprint", pa.array(fp.astype(np.int64)))


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
