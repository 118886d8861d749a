"""Slow-but-obviously-correct pure-Python BM25 oracle (HW3 semantics).

Independent of Spark: dict/loop implementation of the reference
pipeline — tokenize (`IndexBuilder.cpp:56-111`), page table stats
(`ranking_optimizer/src/PageTable.cpp:8-14`), unclamped-IDF BM25
(`ranking_optimizer/src/QueryProcessor.cpp:18-41`), exhaustive
disjunctive / correct conjunctive evaluation, score-DESC /
doc_id-ASC tie-break.  Shares only the tokenizer byte semantics with
the engine (pinned separately by golden tests in test_tokenizer.py).
"""

from __future__ import annotations

import math

from cs6913_web_search_engines_spark.functions.tokenizer import (
    doc_term_freqs,
    split_query,
)

K1 = 1.2
B = 0.75


class OracleIndex:
    def __init__(self, docs: list[tuple[int, str]], length_norm: str = "hw3"):
        self.freqs: dict[int, dict[str, int]] = {}
        self.doc_len: dict[int, int] = {}
        self.df: dict[str, int] = {}
        for doc_id, text in docs:
            tf = doc_term_freqs(text)
            self.freqs[doc_id] = tf
            if length_norm == "hw3":
                self.doc_len[doc_id] = len(tf)
            else:
                self.doc_len[doc_id] = len(text.encode("utf-8"))
            for t in tf:
                self.df[t] = self.df.get(t, 0) + 1
        self.n = len(docs)
        self.avg_len = sum(self.doc_len.values()) / self.n if self.n else 0.0

    def bm25(self, term: str, doc_id: int) -> float:
        tf = self.freqs[doc_id].get(term)
        if tf is None:
            return 0.0
        df = self.df.get(term, 0)
        K = K1 * ((1 - B) + B * self.doc_len[doc_id] / self.avg_len)
        idf = math.log((self.n - df + 0.5) / (df + 0.5))
        return idf * (K1 + 1) * tf / (K + tf)

    def search(self, query: str, k: int, conjunctive: bool = False):
        terms = split_query(query)
        hits = []
        for doc_id, tfs in self.freqs.items():
            present = [t for t in terms if t in tfs]
            if not present:
                continue
            if conjunctive and len(present) != len(terms):
                continue
            score = sum(self.bm25(t, doc_id) for t in terms)
            hits.append((doc_id, score))
        hits.sort(key=lambda x: (-x[1], x[0]))
        return hits[:k]
