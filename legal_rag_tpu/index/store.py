"""Index artifact format.

Replaces the reference's three-file store (``index.faiss`` +
``bm25.pkl`` + ``metadata.json``, reference create_vector_store.py:70-78)
with a framework-native, versioned directory:

    store/
      manifest.json      version, corpus stats, encoder info, shapes,
                         sha256 per artifact (integrity + resumability)
      embeddings.npy     [N, D] float32, L2-normalized (mmap-able)
      bm25.npz           CSR postings: indptr/doc_ids/weights/idf/doc_len
      vocab.txt          BM25 term vocab (line = term, id = line no)
      wp_vocab.txt       WordPiece vocab for the encoder (optional)
      pq.npz             product-quantization codes + codebooks
                         (optional — built with ``--pq-m``, ops/pq.py)
      cross_encoder.npz  trained cross-encoder reranker checkpoint
                         (optional — built with ``--rerank-steps``)
      mv_tokens.npy      [N, Td, D] float16 token embeddings + mask
      mv_mask.npy        (optional — built with ``--multi-vector``,
                         the late-interaction MaxSim tier, ops/maxsim.py)
      chunks.json        full chunk list (text/metadata/canonical_header
                         /section_id) — the reference metadata.json
                         superset

No pickle anywhere (the reference's bm25.pkl is a code-execution
hazard); everything is plain arrays + json, so shards can be
memory-mapped and ``jax.device_put`` straight onto a mesh.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from legal_rag_tpu.ops.sparse import BM25Index

FORMAT_VERSION = 1


def _sha256(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for block in iter(lambda: f.read(1 << 20), b""):
            h.update(block)
    return h.hexdigest()


@dataclasses.dataclass
class VectorStore:
    """In-memory handle on the index artifacts."""

    embeddings: np.ndarray          # [N, D] float32 unit rows
    bm25: BM25Index
    chunks: List[Dict]              # chunk dicts incl. section_id
    wp_vocab: Optional[Dict[str, int]] = None
    manifest: Optional[Dict] = None
    encoder_info: Optional[Dict] = None   # encoder arch/seed that built
                                          # the embeddings (manifest'd)
    corpus_hash: Optional[str] = None     # identity of the ingested
                                          # corpus (resumable builds)
    encoder_params: Optional[Dict] = None  # the encoder WEIGHTS — query
                                           # encoding must use exactly
                                           # the model that embedded the
                                           # docs (fine-tuned/converted
                                           # weights are not derivable
                                           # from seed+config)
    pq_codes: Optional[np.ndarray] = None       # [N, m] uint8 packed
                                                # 4-bit PQ codes
    pq_codebooks: Optional[np.ndarray] = None   # [2m, 16, dsub] f32 —
                                                # trained once at build
                                                # so loads skip k-means
    pq_rotation: Optional[np.ndarray] = None    # [D, D] OPQ rotation
    ce_params: Optional[Dict] = None   # trained cross-encoder reranker
                                       # checkpoint {"trunk","head"}
                                       # (models/cross_encoder.py)
    ce_alpha: float = 1.0              # CE blend weight fit by the
                                       # build gate (1.0 = pure CE)
    mv_tokens: Optional[np.ndarray] = None   # [N, Td, D] float16 token
                                             # embeddings (multi-vector
                                             # late-interaction tier,
                                             # ops/maxsim.py; mmap'd)
    mv_mask: Optional[np.ndarray] = None     # [N, Td] uint8 (1 = real)
    ivf_centroids: Optional[np.ndarray] = None  # [n_cells, D] f32 cell
                                                # means (ops/pq.py IVF
                                                # coarse pruning)
    ivf_doc_ids: Optional[np.ndarray] = None    # [n_cells*S] i32 cell
                                                # permutation, -1 = pad
    ivf_cell_size: int = 0
    build_params: Optional[Dict] = None  # the build recipe (finetune/
                                         # rerank/pq/mv args) stamped
                                         # into the manifest so eval
                                         # provenance can name what a
                                         # store actually is

    def ivf_index(self):
        """Materialize the :class:`legal_rag_tpu.ops.pq.IVFIndex` from
        the persisted centroids + permutation (cell-ordered codes are a
        derived view of ``pq_codes`` — not duplicated on disk)."""
        if self.ivf_centroids is None or self.pq_codes is None:
            return None
        from legal_rag_tpu.ops.pq import IVFIndex

        ids = np.asarray(self.ivf_doc_ids)
        codes = np.zeros(
            (len(ids), self.pq_codes.shape[1]), np.uint8
        )
        real = ids >= 0
        codes[real] = np.asarray(self.pq_codes)[ids[real]]
        return IVFIndex(
            centroids=np.asarray(self.ivf_centroids),
            codes=codes,
            doc_ids=ids,
            cell_size=int(self.ivf_cell_size),
        )

    @property
    def n_docs(self) -> int:
        return self.embeddings.shape[0]

    @property
    def dim(self) -> int:
        return self.embeddings.shape[1]

    # -- persistence -------------------------------------------------------

    def save(self, store_dir) -> Dict:
        store_dir = Path(store_dir)
        store_dir.mkdir(parents=True, exist_ok=True)

        # write-to-temp + atomic rename: saving INTO the directory this
        # store was mmap-loaded from would otherwise truncate the file
        # its own ``embeddings`` memory-map is still reading (observed
        # as a mid-array OSError), and a crash mid-save can never leave
        # a half-written artifact behind
        def _atomic_npy(path: Path, arr: np.ndarray) -> None:
            tmp = path.with_suffix(".npy.tmp")
            with open(tmp, "wb") as f:      # file handle: np.save must
                np.save(f, arr)             # not append a .npy suffix
            tmp.replace(path)

        _atomic_npy(
            store_dir / "embeddings.npy",
            np.ascontiguousarray(self.embeddings),
        )
        np.savez_compressed(
            store_dir / "bm25.npz",
            indptr=self.bm25.indptr,
            doc_ids=self.bm25.doc_ids,
            weights=self.bm25.weights,
            idf=self.bm25.idf,
            doc_len=self.bm25.doc_len,
            params=np.array(
                [self.bm25.k1, self.bm25.b, self.bm25.epsilon, self.bm25.avgdl],
                dtype=np.float64,
            ),
        )
        inv = {i: t for t, i in self.bm25.vocab.items()}
        with open(store_dir / "vocab.txt", "w", encoding="utf-8") as f:
            for i in range(len(inv)):
                f.write(inv[i] + "\n")
        if self.wp_vocab:
            inv_wp = {i: t for t, i in self.wp_vocab.items()}
            with open(store_dir / "wp_vocab.txt", "w", encoding="utf-8") as f:
                for i in range(len(inv_wp)):
                    f.write(inv_wp[i] + "\n")
        with open(store_dir / "chunks.json", "w", encoding="utf-8") as f:
            json.dump(self.chunks, f, ensure_ascii=False)
        if self.encoder_params is not None:
            from legal_rag_tpu.models.convert import save_params_npz

            save_params_npz(self.encoder_params, store_dir / "encoder.npz")
        if self.pq_codes is not None:
            pq_arrays = {
                "codes": self.pq_codes, "codebooks": self.pq_codebooks,
            }
            if self.pq_rotation is not None:
                pq_arrays["rotation"] = self.pq_rotation
            np.savez_compressed(store_dir / "pq.npz", **pq_arrays)
        if self.ce_params is not None:
            from legal_rag_tpu.models.convert import save_params_npz

            save_params_npz(self.ce_params, store_dir / "cross_encoder.npz")
        if self.ivf_centroids is not None:
            np.savez_compressed(
                store_dir / "ivf.npz",
                centroids=self.ivf_centroids,
                doc_ids=self.ivf_doc_ids,
                cell_size=np.int64(self.ivf_cell_size),
            )
        if self.mv_tokens is not None:
            # separate .npy files (not npz) so serving can mmap the
            # token slab — at Td=32 it is 16x the embedding matrix
            _atomic_npy(
                store_dir / "mv_tokens.npy",
                np.asarray(self.mv_tokens, dtype=np.float16),
            )
            _atomic_npy(
                store_dir / "mv_mask.npy",
                np.asarray(self.mv_mask, dtype=np.uint8),
            )

        artifacts = ["embeddings.npy", "bm25.npz", "vocab.txt", "chunks.json"]
        if self.wp_vocab:
            artifacts.append("wp_vocab.txt")
        if self.encoder_params is not None:
            artifacts.append("encoder.npz")
        if self.pq_codes is not None:
            artifacts.append("pq.npz")
        if self.ce_params is not None:
            artifacts.append("cross_encoder.npz")
        if self.ivf_centroids is not None:
            artifacts.append("ivf.npz")
        if self.mv_tokens is not None:
            artifacts.extend(["mv_tokens.npy", "mv_mask.npy"])
        manifest = {
            "format_version": FORMAT_VERSION,
            "n_docs": int(self.n_docs),
            "dim": int(self.dim),
            "bm25_vocab_size": self.bm25.vocab_size,
            "bm25_nnz": int(len(self.bm25.doc_ids)),
            "bm25_params": {
                "k1": self.bm25.k1, "b": self.bm25.b,
                "epsilon": self.bm25.epsilon, "avgdl": self.bm25.avgdl,
            },
            "encoder": self.encoder_info,
            "corpus_hash": self.corpus_hash,
            "ce_alpha": float(self.ce_alpha),
            "build_params": self.build_params,
            "artifacts": {
                name: _sha256(store_dir / name) for name in artifacts
            },
        }
        with open(store_dir / "manifest.json", "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=2)
        self.manifest = manifest
        return manifest

    @classmethod
    def load(cls, store_dir, verify: bool = True) -> "VectorStore":
        store_dir = Path(store_dir)
        with open(store_dir / "manifest.json", "r", encoding="utf-8") as f:
            manifest = json.load(f)
        if manifest["format_version"] > FORMAT_VERSION:
            raise ValueError(
                f"store format {manifest['format_version']} is newer than "
                f"this framework ({FORMAT_VERSION})"
            )
        if verify:
            for name, digest in manifest["artifacts"].items():
                actual = _sha256(store_dir / name)
                if actual != digest:
                    raise ValueError(
                        f"artifact {name} hash mismatch "
                        f"(expected {digest[:12]}, got {actual[:12]})"
                    )

        # memory-mapped: device_put / ShardedIndex reads pages straight
        # from the file; no host-RAM copy of a potentially huge matrix
        embeddings = np.load(store_dir / "embeddings.npy", mmap_mode="r")

        data = np.load(store_dir / "bm25.npz")
        with open(store_dir / "vocab.txt", "r", encoding="utf-8") as f:
            vocab = {line.rstrip("\n"): i for i, line in enumerate(f)}
        k1, b, epsilon, avgdl = data["params"]
        bm25 = BM25Index(
            vocab=vocab,
            indptr=data["indptr"],
            doc_ids=data["doc_ids"],
            weights=data["weights"],
            idf=data["idf"],
            doc_len=data["doc_len"],
            n_docs=int(embeddings.shape[0]),
            avgdl=float(avgdl),
            k1=float(k1),
            b=float(b),
            epsilon=float(epsilon),
        )
        wp_vocab = None
        wp_path = store_dir / "wp_vocab.txt"
        if wp_path.exists():
            with open(wp_path, "r", encoding="utf-8") as f:
                wp_vocab = {line.rstrip("\n"): i for i, line in enumerate(f)}
        encoder_params = None
        # only trust encoder.npz when THIS manifest lists (and thus
        # hash-verified) it — a stale file from an earlier build in the
        # same directory must not silently supply wrong weights
        if "encoder.npz" in manifest.get("artifacts", {}):
            from legal_rag_tpu.models.convert import load_params_npz

            encoder_params = load_params_npz(store_dir / "encoder.npz")
        pq_codes = pq_codebooks = pq_rotation = None
        if "pq.npz" in manifest.get("artifacts", {}):
            pq_data = np.load(store_dir / "pq.npz")
            pq_codes, pq_codebooks = pq_data["codes"], pq_data["codebooks"]
            if "rotation" in pq_data.files:
                pq_rotation = pq_data["rotation"]
        ce_params = None
        if "cross_encoder.npz" in manifest.get("artifacts", {}):
            from legal_rag_tpu.models.convert import load_params_npz

            ce_params = load_params_npz(store_dir / "cross_encoder.npz")
        mv_tokens = mv_mask = None
        if "mv_tokens.npy" in manifest.get("artifacts", {}):
            mv_tokens = np.load(store_dir / "mv_tokens.npy", mmap_mode="r")
            mv_mask = np.load(store_dir / "mv_mask.npy", mmap_mode="r")
        ivf_centroids = ivf_doc_ids = None
        ivf_cell_size = 0
        if "ivf.npz" in manifest.get("artifacts", {}):
            ivf_data = np.load(store_dir / "ivf.npz")
            ivf_centroids = ivf_data["centroids"]
            ivf_doc_ids = ivf_data["doc_ids"]
            ivf_cell_size = int(ivf_data["cell_size"])
        with open(store_dir / "chunks.json", "r", encoding="utf-8") as f:
            chunks = json.load(f)
        return cls(
            embeddings=embeddings,
            bm25=bm25,
            chunks=chunks,
            wp_vocab=wp_vocab,
            manifest=manifest,
            encoder_info=manifest.get("encoder"),
            corpus_hash=manifest.get("corpus_hash"),
            encoder_params=encoder_params,
            pq_codes=pq_codes,
            pq_codebooks=pq_codebooks,
            pq_rotation=pq_rotation,
            ce_params=ce_params,
            ce_alpha=float(manifest.get("ce_alpha", 1.0)),
            mv_tokens=mv_tokens,
            mv_mask=mv_mask,
            ivf_centroids=ivf_centroids,
            ivf_doc_ids=ivf_doc_ids,
            ivf_cell_size=ivf_cell_size,
            build_params=manifest.get("build_params"),
        )
