"""Text-side node features: CPC definitions and patent titles → embeddings.

Framework-module re-implementation of the notebook text-embedding stages
(graph generation (1).ipynb cells 12-15, 19-23, 26-27): the reference runs
the HF CLIP text encoder over CPC definition strings (parsed from USPTO
XML/fixed-width files) and patent titles, producing per-node 512-d feature
pickles consumed by the feature-matrix builder.

Here the encoder is the framework's Flax ``TextTransformer``; tokenization
uses the HF CLIP tokenizer when a local checkpoint provides one, otherwise a
deterministic hashing tokenizer (this environment has no network, so vocab
files may be absent — the hashing fallback keeps the pipeline runnable and
reproducible, trading semantic quality for availability).
"""

from __future__ import annotations

import hashlib
import re
from typing import Callable, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.vit import TEXT_B, TextConfig, TextTransformer


def hashing_tokenizer(vocab_size: int = 49408, context_length: int = 77
                      ) -> Callable[[str], np.ndarray]:
    """Deterministic word-hash tokenizer: id = BLAKE2(word) mod (vocab−3)+2,
    with 1 as BOS and per-sequence max id guaranteed at the EOS slot (the
    text tower pools at argmax id — models/vit.py TextTransformer)."""

    def tokenize(text: str) -> np.ndarray:
        words = re.findall(r"[a-z0-9]+", text.lower())[: context_length - 2]
        ids = [1]
        for w in words:
            h = int.from_bytes(hashlib.blake2s(w.encode()).digest()[:4], "big")
            ids.append(2 + h % (vocab_size - 3))
        ids.append(vocab_size - 1)          # EOS = max id ⇒ argmax pools here
        out = np.zeros(context_length, np.int32)
        out[:len(ids)] = ids[:context_length]
        return out

    return tokenize


def clip_tokenizer_or_fallback(checkpoint_dir: str | None,
                               config: TextConfig = TEXT_B):
    """Real CLIP BPE from a local checkpoint when available.

    Preference order: (1) the framework's own byte-level BPE engine
    (data/bpe.py, byte-identical to HF — tests/test_bpe.py) over the
    checkpoint's vocab.json/merges.txt, (2) ``CLIPTokenizerFast`` for
    checkpoints that only ship tokenizer.json, (3) the hashing fallback."""
    if checkpoint_dir:
        from .bpe import load_clip_bpe

        bpe = load_clip_bpe(checkpoint_dir, config.context_length)
        if bpe is not None:
            return bpe
        try:
            from transformers import CLIPTokenizerFast

            tok = CLIPTokenizerFast.from_pretrained(checkpoint_dir)

            def tokenize(text: str) -> np.ndarray:
                ids = tok(text, padding="max_length", truncation=True,
                          max_length=config.context_length)["input_ids"]
                return np.asarray(ids, np.int32)

            return tokenize
        except Exception:
            pass
    return hashing_tokenizer(config.vocab_size, config.context_length)


def embed_texts(texts: Sequence[str], model: TextTransformer, params,
                tokenize: Callable[[str], np.ndarray],
                batch_size: int = 256) -> np.ndarray:
    """Batched text-tower forward → [n, projection_dim] float32."""
    apply_jit = jax.jit(model.apply)       # params as ARGUMENT, not closure
    out = []
    ids = np.stack([tokenize(t) for t in texts]) if texts else \
        np.zeros((0, model.config.context_length), np.int32)
    for s in range(0, len(ids), batch_size):
        chunk = ids[s:s + batch_size]
        pad = batch_size - len(chunk)
        if pad:
            chunk = np.pad(chunk, ((0, pad), (0, 0)))
        feats = np.asarray(apply_jit(params, jnp.asarray(chunk)))
        out.append(feats[:batch_size - pad])
    return np.concatenate(out, axis=0) if out else np.zeros((0, 0), np.float32)


def build_text_feature_dicts(
    cpc_definitions: Mapping[str, str],
    patent_titles: Mapping[str, str] | None = None,
    model: TextTransformer | None = None,
    params=None,
    checkpoint_dir: str | None = None,
    seed: int = 0,
) -> tuple[dict[str, np.ndarray], dict[str, np.ndarray]]:
    """(cpc_features, patent_features) keyed like the graph index maps.

    ``cpc_definitions``: CPC code → definition text (any level).
    ``patent_titles``: patent id → title.
    With no model given, a default TextTransformer is random-initialized —
    features are then consistent-but-untrained (fine for pipeline plumbing;
    supply a converted CLIP checkpoint for semantic features).
    """
    if model is None:
        model = TextTransformer(TEXT_B)
    tokenize = clip_tokenizer_or_fallback(checkpoint_dir, model.config)
    if params is None:
        params = jax.jit(model.init)(jax.random.key(seed),
                            jnp.zeros((1, model.config.context_length),
                                      jnp.int32))
    cpc_keys = sorted(cpc_definitions)
    cpc_emb = embed_texts([cpc_definitions[k] for k in cpc_keys], model,
                          params, tokenize)
    cpc_features = {k: cpc_emb[i] for i, k in enumerate(cpc_keys)}
    patent_features: dict[str, np.ndarray] = {}
    if patent_titles:
        keys = sorted(patent_titles)
        emb = embed_texts([patent_titles[k] for k in keys], model, params,
                          tokenize)
        patent_features = {k: emb[i] for i, k in enumerate(keys)}
    return cpc_features, patent_features


def parse_cpc_definitions_fixed_width(lines: Sequence[str]) -> dict[str, str]:
    """Parse USPTO fixed-width CPC title list lines 'A01B    3/14    Title…'
    → {code: title} (graph gen cell 10's alternative parser)."""
    out: dict[str, str] = {}
    for line in lines:
        line = line.rstrip("\n")
        if not line or line.startswith("#"):
            continue
        m = re.match(r"^([A-Z]\d{2}[A-Z]?)\s+(?:[\d/]+\s+)?(.+)$", line)
        if m:
            code, title = m.group(1), m.group(2).strip()
            out.setdefault(code, title)
    return out
