"""Fulltext index — host-side inverted index with TF-IDF scoring.

The reference embeds RediSearch's fulltext engine (index/redisearch/).
Tokenization: lowercase word-split with stopwords; scoring: TF-IDF (the
reference registers a TFIDF scorer, src/module_init.rs:218-235)."""

from __future__ import annotations

import math
import re

import numpy as np

from falkordb_tpu.graph.attrstore import ABSENT

DEFAULT_STOPWORDS = {
    "a", "is", "the", "an", "and", "are", "as", "at", "be", "but", "by",
    "for", "if", "in", "into", "it", "no", "not", "of", "on", "or", "such",
    "that", "their", "then", "there", "these", "they", "this", "to", "was",
    "will", "with",
}

_TOKEN = re.compile(r"[\w]+")


def tokenize(text: str, stopwords=DEFAULT_STOPWORDS):
    return [t for t in (m.group(0).lower() for m in _TOKEN.finditer(text))
            if t not in stopwords]


class FulltextIndex:
    def __init__(self, postings, doc_len, n_docs, stopwords):
        self.postings = postings  # term -> {doc_id: tf}
        self.doc_len = doc_len
        self.n_docs = n_docs
        self.stopwords = stopwords

    @staticmethod
    def build(store, d) -> "FulltextIndex":
        stop = set(DEFAULT_STOPWORDS)
        if d.options and "stopwords" in d.options:
            stop = {s.lower() for s in d.options["stopwords"]}
        lid = (store.schema.label_id(d.label) if d.entity == "node"
               else store.schema.reltype_id(d.label))
        postings: dict = {}
        doc_len: dict = {}
        if lid is not None:
            attrs = store.node_attrs if d.entity == "node" else store.edge_attrs
            if d.entity == "node":
                mask = store.label_masks.get(lid)
                ents = (np.nonzero(mask[: store.node_max])[0]
                        if mask is not None else [])
            else:
                live = ~store.e_deleted[: store.edge_max]
                ents = np.nonzero(
                    (store.e_type[: store.edge_max] == lid) & live)[0]
            for prop in d.props:
                aid = store.schema.attr_id(prop)
                if aid is None:
                    continue
                col = attrs.columns.get(aid)
                if col is None:
                    continue
                for i in ents:
                    v = col.data[i]
                    if not isinstance(v, str):
                        continue
                    toks = tokenize(v, stop)
                    doc_len[int(i)] = doc_len.get(int(i), 0) + len(toks)
                    for t in toks:
                        postings.setdefault(t, {}).setdefault(int(i), 0)
                        postings[t][int(i)] += 1
        return FulltextIndex(postings, doc_len, max(len(doc_len), 1), stop)

    def query(self, text: str, limit=None):
        """OR-of-terms with TF-IDF ranking → [(doc_id, score)] desc."""
        scores: dict = {}
        for t in tokenize(text, self.stopwords):
            plist = self.postings.get(t)
            if not plist:
                continue
            idf = math.log(1.0 + self.n_docs / len(plist))
            for doc, tf in plist.items():
                scores[doc] = scores.get(doc, 0.0) + tf * idf
        out = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return out[:limit] if limit else out
