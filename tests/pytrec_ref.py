"""Vendored pure-python re-statement of pytrec_eval's conventions.

The reference's quality numbers (HW3 Table 1) come from pytrec_eval
(``ranking_optimizer/src/ranking-optimizer/trec_eval.py:40-59``),
which wraps NIST trec_eval.  This module restates the exact
conventions of the measures the reference uses — ``map``,
``recip_rank``, ``ndcg_cut.k``, ``recall.k`` — so the Spark operator
(`operators/evalmetrics.trec_metrics`) can be pinned against them
per metric per query, even in environments without pytrec_eval
installed (when it IS importable, the test also cross-checks this
re-statement against the real thing):

* the run's rank column is IGNORED; docs re-sort by score DESC then
  document id STRING DESC (trec_eval's internal sort);
* only queries present in the qrels are evaluated (unjudged queries
  are skipped, and corpus means average over judged queries only);
* AP normalizes by |relevant in qrels|, unretrieved relevant score 0;
* NDCG uses LINEAR gain rel_i with 1/log2(rank+1) discount
  (trec_eval m_ndcg_cut, not the exponential-gain variant), ideal
  ranking = judged docs by rel desc, cut at k;
* recall.k = relevant retrieved in the top k / |relevant in qrels|.
"""

from __future__ import annotations

import math


def trec_eval_metrics(
    run: dict[str, dict[str, float]],
    qrels: dict[str, dict[str, int]],
    ks: tuple[int, ...] = (10, 100),
) -> dict[str, dict[str, float]]:
    """{qid: {docid: score}} × {qid: {docid: rel}} → per-query
    {qid: {rr, ap, ndcg_<k>, recall_<k>}} for judged queries only."""
    out: dict[str, dict[str, float]] = {}
    for qid, docs in run.items():
        if qid not in qrels:
            continue  # pytrec_eval evaluates only judged queries
        qr = qrels[qid]
        ranked = sorted(docs.items(), key=lambda kv: (kv[1], kv[0]),
                        reverse=True)  # score desc, docid-string desc
        n_rel = sum(1 for r in qr.values() if r > 0)
        rr = ap = 0.0
        rel_seen = 0
        dcg = dict.fromkeys(ks, 0.0)
        hits = dict.fromkeys(ks, 0)
        for rank, (d, _score) in enumerate(ranked, start=1):
            rel = qr.get(d, 0)
            if rel > 0:
                rel_seen += 1
                if rr == 0.0:
                    rr = 1.0 / rank
                ap += rel_seen / rank
                for k in ks:
                    if rank <= k:
                        dcg[k] += rel / math.log2(rank + 1)
                        hits[k] += 1
        ideal = sorted((r for r in qr.values() if r > 0), reverse=True)
        res = {"rr": rr, "ap": ap / n_rel if n_rel else 0.0}
        for k in ks:
            idcg = sum(r / math.log2(i + 2) for i, r in enumerate(ideal[:k]))
            res[f"ndcg_{k}"] = dcg[k] / idcg if idcg else 0.0
            res[f"recall_{k}"] = hits[k] / n_rel if n_rel else 0.0
        out[qid] = res
    return out
