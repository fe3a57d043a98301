"""Vector store: embeddings-as-matmul retrieval (TPU-native design).

Replaces the reference's ChromaDB + sentence-transformers stack
(/root/reference/RAG_Assistant/vector_store_builder.py:145-368,
rag_assistant.py:131-211): documents are embedded once into a dense matrix;
a query is one embed + one ``jnp`` matvec + ``lax.top_k`` — no HNSW index,
no external service.  At knowledge-base scale (dozens to millions of
chunks) a single fused matmul on the device is both simpler and faster than
approximate search.

Embedders:
* :class:`HashedNgramEmbedder` (default) — deterministic hashed word +
  character-n-gram TF embedding with IDF-style weighting, pure numpy,
  zero model weights, fully offline.
* :class:`SentenceTransformerEmbedder` — optional MiniLM (all-MiniLM-L6-v2,
  384-d) when the model weights are available locally.

Persistence is a single ``.npz`` (matrix + docs metadata) instead of the
reference's on-disk HNSW binaries.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
from dataclasses import asdict
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .knowledge import KBDocument, builtin_knowledge_base

__all__ = [
    "HashedNgramEmbedder",
    "SentenceTransformerEmbedder",
    "VectorStore",
    "build_vector_store",
    "load_vector_store",
]

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def _stable_hash(token: str, dim: int, salt: str = "") -> int:
    h = hashlib.blake2b(f"{salt}:{token}".encode(), digest_size=8).digest()
    return int.from_bytes(h, "little") % dim


class HashedNgramEmbedder:
    """Deterministic hashed TF-IDF embedding over words + char trigrams.

    ``fit_idf`` learns inverse-document-frequency weights from the corpus so
    boilerplate shared across documents (guard sections, common radiology
    vocabulary) stops dominating cosine similarity.
    """

    name = "hashed-ngram-v2"  # v2: 8192-d hash space (4× fewer collisions)

    def __init__(self, dim: int = 8192, idf: Optional[np.ndarray] = None):
        self.dim = dim
        self.idf = idf  # (dim,) or None = unweighted

    def fit_idf(self, texts: Sequence[str]) -> "HashedNgramEmbedder":
        tf = self._tf_matrix(texts)
        df = (tf > 0).sum(axis=0)
        self.idf = np.log(1.0 + len(texts) / np.maximum(df, 1.0)).astype(np.float32)
        return self

    #: char-trigram features get a fraction of a whole word's weight —
    #: they provide typo/morphology robustness without drowning exact matches.
    #: (Word bigrams were evaluated and REJECTED: on the 33-query labeled
    #: eval in tests/test_rag_eval.py every bigram weight tried (0.3/0.5/1.0)
    #: lowered accuracy — paraphrased queries almost never reproduce document
    #: bigrams, so they only dilute document norms and add hash collisions
    #: (top-2 32→31/30/28 of 33).  The winning lever was collision reduction
    #: via hash dim 2048→8192: top-2 31→32/33 at equal top-1, pinned by
    #: test_v2_embedder_beats_v1_dim.)
    TRIGRAM_WEIGHT = 0.3

    def _features(self, text: str) -> List[tuple]:
        words = _TOKEN_RE.findall(text.lower())
        feats = [(w, 1.0) for w in words]
        for w in words:
            padded = f"#{w}#"
            feats.extend(
                (padded[i : i + 3], self.TRIGRAM_WEIGHT)
                for i in range(len(padded) - 2)
            )
        return feats

    def _tf_matrix(self, texts: Sequence[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), np.float32)
        for i, text in enumerate(texts):
            for f, weight in self._features(text):
                out[i, _stable_hash(f, self.dim)] += weight
            np.sqrt(out[i], out=out[i])  # sub-linear TF
        return out

    def embed(self, texts: Sequence[str]) -> np.ndarray:
        out = self._tf_matrix(texts)
        if self.idf is not None:
            out *= self.idf
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        np.divide(out, norms, out=out, where=norms > 0)
        return out


class SentenceTransformerEmbedder:
    """MiniLM sentence embeddings when available (optional).

    ``local_files_only=True`` restricts loading to the local HF cache and
    fails fast — use it in egress-less environments, where the default
    path would otherwise burn ~5 network retries per missing file.
    """

    name = "all-MiniLM-L6-v2"

    def __init__(
        self,
        model_name: str = "all-MiniLM-L6-v2",
        local_files_only: bool = False,
    ):
        from sentence_transformers import SentenceTransformer  # may raise

        self.name = model_name  # persisted by VectorStore.save; the class
        # default only describes the default model
        self.model = SentenceTransformer(
            model_name, local_files_only=local_files_only
        )
        self.dim = self.model.get_sentence_embedding_dimension()

    def embed(self, texts: Sequence[str]) -> np.ndarray:
        vecs = self.model.encode(list(texts), normalize_embeddings=True)
        return np.asarray(vecs, np.float32)


#: Below this many chunks a host matvec beats a device round-trip; above it
#: the store keeps its matrix on-device and retrieval is one fused
#: matmul + lax.top_k.
DEVICE_TOPK_MIN_ROWS = 4096


def _topk_scores(
    matrix: np.ndarray, query: np.ndarray, k: int, device_matrix=None
) -> Tuple[np.ndarray, np.ndarray]:
    """Cosine top-k: device matmul for large stores, numpy for small ones.

    ``device_matrix`` is the caller's cached on-device copy (uploading the
    full store matrix per query would dominate the matmul it feeds).
    """
    k = min(k, matrix.shape[0])
    if device_matrix is not None:
        try:
            import jax
            import jax.numpy as jnp

            scores = device_matrix @ jnp.asarray(query)
            vals, idx = jax.lax.top_k(scores, k)
            return np.asarray(vals), np.asarray(idx)
        except Exception:
            pass
    scores = matrix @ query
    idx = np.argsort(-scores)[:k]
    return scores[idx], idx


class VectorStore:
    """Dense-retrieval store over knowledge documents."""

    def __init__(self, docs: List[KBDocument], matrix: np.ndarray, embedder):
        self.docs = docs
        self.matrix = matrix.astype(np.float32)
        self.embedder = embedder
        self._device_matrix = None  # lazy one-time upload for large stores

    # -- queries -----------------------------------------------------------

    def _device_copy(self):
        """Upload the matrix once; queries then only ship the query vector."""
        if self._device_matrix is None and self.matrix.shape[0] >= DEVICE_TOPK_MIN_ROWS:
            try:
                import jax.numpy as jnp

                self._device_matrix = jnp.asarray(self.matrix)
            except Exception:
                pass
        return self._device_matrix

    def retrieve(self, query: str, k: int = 2) -> List[Tuple[KBDocument, float]]:
        q = self.embedder.embed([query])[0]
        vals, idx = _topk_scores(self.matrix, q, k, self._device_copy())
        return [(self.docs[int(i)], float(v)) for v, i in zip(vals, idx)]

    def query(self, query_text: str, n_results: int = 2) -> dict:
        """ChromaDB-shaped result dict for drop-in compatibility."""
        hits = self.retrieve(query_text, n_results)
        return {
            "documents": [[d.embed_text for d, _ in hits]],
            "metadatas": [
                [
                    {"title": d.title, "keywords": d.keywords, "source": d.source}
                    for d, _ in hits
                ]
            ],
            "distances": [[1.0 - s for _, s in hits]],
        }

    # -- persistence --------------------------------------------------------

    def save(self, path) -> None:
        # np.savez appends ".npz" to extensionless paths; normalize here so
        # save(p) / load_vector_store(p) round-trip with the same string
        path = _npz_path(path)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        docs_json = json.dumps([asdict(d) for d in self.docs])
        extra = {}
        if getattr(self.embedder, "idf", None) is not None:
            extra["idf"] = self.embedder.idf
        np.savez_compressed(
            path,
            matrix=self.matrix,
            docs=np.frombuffer(docs_json.encode(), np.uint8),
            embedder=np.frombuffer(self.embedder.name.encode(), np.uint8),
            **extra,
        )


def build_vector_store(
    docs: Optional[List[KBDocument]] = None,
    embedder=None,
    knowledge_dir=None,
) -> VectorStore:
    """Embed a knowledge base into a store (builtin KB by default)."""
    if docs is None:
        if knowledge_dir is not None:
            from .knowledge import load_knowledge_dir

            docs = load_knowledge_dir(knowledge_dir)
        else:
            docs = builtin_knowledge_base()
    texts = [d.embed_text for d in docs]
    if embedder is None:
        embedder = HashedNgramEmbedder().fit_idf(texts)
    matrix = embedder.embed(texts)
    return VectorStore(docs, matrix, embedder)


def _npz_path(path) -> str:
    path = os.fspath(path)
    return path if path.endswith(".npz") else path + ".npz"


def load_vector_store(path, embedder=None) -> VectorStore:
    with np.load(_npz_path(path)) as z:
        docs_json = bytes(z["docs"]).decode()
        matrix = z["matrix"]
        saved_embedder = bytes(z["embedder"]).decode()
        idf = z["idf"] if "idf" in z.files else None
    docs = [KBDocument(**d) for d in json.loads(docs_json)]
    if embedder is None:
        if saved_embedder.startswith("hashed-ngram"):
            if saved_embedder != HashedNgramEmbedder.name:
                # feature space changed since the store was written; the doc
                # texts are persisted, so re-embedding reproduces it exactly
                return build_vector_store(docs)
            embedder = HashedNgramEmbedder(dim=matrix.shape[1], idf=idf)
        else:
            # offline-first: the local HF cache path fails fast; only fall
            # back to the network-retry path if the cache misses
            try:
                embedder = SentenceTransformerEmbedder(
                    saved_embedder, local_files_only=True
                )
            except Exception:
                embedder = SentenceTransformerEmbedder(saved_embedder)
    return VectorStore(docs, matrix, embedder)
