"""CLI surface + driver entry-point tests (tiny configs, CPU)."""

import json
import os
import sys

import numpy as np
import pytest


def run_cli(argv):
    from patent_tpu.cli.main import main

    return main(argv)


def test_prep_action(tmp_path):
    assert run_cli(["prep", "--path", str(tmp_path)]) == 0
    assert os.path.exists(tmp_path / "prepared_training_data" /
                          "training_data.npz")
    with open(tmp_path / "prepared_training_data" / "label_offsets.json") as f:
        offsets = json.load(f)
    assert "num_labels" in offsets and "patents" in offsets


def test_train_hyp_action_and_artifacts(tmp_path):
    rc = run_cli(["train_hyp", "--path", str(tmp_path), "--epochs", "2",
                  "batch_size=32", "embed_dim=8", "hidden_dims=[16]"])
    assert rc == 0
    models = os.listdir(tmp_path / "models")
    assert any(m.startswith("best_retrieval_model") for m in models)
    # test action reuses the checkpoint
    rc = run_cli(["test", "--path", str(tmp_path),
                  "embed_dim=8", "hidden_dims=[16]"])
    assert rc == 0


def test_test_action_without_checkpoint(tmp_path):
    rc = run_cli(["test", "--path", str(tmp_path)])
    assert rc == 1  # clear failure, not a crash


def test_unknown_override_rejected(tmp_path):
    with pytest.raises(ValueError, match="unknown config field"):
        run_cli(["train_hyp", "--path", str(tmp_path), "not_a_field=3"])


def test_entry_forward():
    import jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as g

    fn, (params, batch) = g.entry()
    out = jax.jit(fn)(params, batch)
    assert out.shape == (8, 128)
    assert bool(np.all(np.isfinite(np.asarray(out, np.float32))))
    # hyperbolic head output lies in the c=2 ball
    norms = np.linalg.norm(np.asarray(out, np.float32), axis=-1)
    assert norms.max() <= 1 / np.sqrt(2) + 1e-4


def test_dryrun_multichip(eight_devices):
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_retrieve_action(tmp_path, capsys):
    rc = run_cli(["retrieve", "--path", str(tmp_path), "--synthetic",
                  "--k", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    # prints k scored lines "score  name.png"
    scored = [l for l in out.splitlines() if l.strip().endswith(".png")
              and l.strip()[0].isdigit() or l.strip().startswith("0.")]
    assert len([l for l in out.splitlines() if ".png" in l]) >= 3


def test_retrieve_action_quantized(tmp_path, capsys):
    """--quantize serves the int8 PTQ encoder through the same engine."""
    rc = run_cli(["retrieve", "--path", str(tmp_path), "--synthetic",
                  "--quantize", "--k", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "int8-quantized" in out
    assert len([l for l in out.splitlines() if ".png" in l]) >= 3


def test_retrieve_action_pruned_writes_tagged_index(tmp_path, capsys):
    """--keep-tokens serves the ink-mass-pruned tower AND writes a
    _kt<K>-tagged index: a pruned gallery must never be silently shared
    with (or loaded by) a full-tower run."""
    rc = run_cli(["retrieve", "--path", str(tmp_path), "--synthetic",
                  "--keep-tokens", "6", "--k", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "token selection: serving 6 of" in out
    emb = tmp_path / "embeddings"
    tagged = [f for f in os.listdir(emb) if "_kt6" in f]
    assert tagged, os.listdir(emb)
    # a full-tower run on the same path builds its OWN untagged index
    rc = run_cli(["retrieve", "--path", str(tmp_path), "--synthetic",
                  "--k", "3"])
    assert rc == 0
    untagged = [f for f in os.listdir(emb)
                if f.endswith(".npy") and "_kt" not in f]
    assert untagged, os.listdir(emb)


def test_eval_with_real_corpus_split(tmp_path):
    """--path with metadata.json + images/: the CLI splits with the
    reference protocol and evaluates."""
    from patent_tpu.data import synthetic

    synthetic.write_synthetic_corpus(str(tmp_path), num_patents=6,
                                     figures_per_patent=4, image_size=64)
    rc = run_cli(["eval", "--path", str(tmp_path)])
    assert rc == 0
    assert os.path.exists(tmp_path / "ground_truth.json")
    assert os.path.isdir(tmp_path / "test_gallery")
    assert os.path.isdir(tmp_path / "test_query")
    # split dirs are symlinks into images/ (no copies)
    import os as _os

    entries = _os.listdir(tmp_path / "test_gallery")
    assert entries and _os.path.islink(tmp_path / "test_gallery" / entries[0])
    # re-run reuses the existing split + saved index
    rc = run_cli(["eval", "--path", str(tmp_path)])
    assert rc == 0


def test_profile_named_serving_configs(tmp_path, capsys):
    """--profile resolves SERVING_PROFILES to quantize/keep_tokens (the
    round-5 official north-star dial); explicit flags win over the
    profile's values."""
    from patent_tpu.utils.config import SERVING_PROFILES

    assert SERVING_PROFILES["recommended"] == {"quantize": True,
                                               "keep_tokens": 175}
    assert SERVING_PROFILES["turbo"] == {"quantize": True,
                                         "keep_tokens": 127}
    assert SERVING_PROFILES["exact"] == {"quantize": True,
                                         "keep_tokens": None}
    # a synthetic corpus has few patches; the CLI clamps keep>=patches to
    # the exact tower but must still run quantized end to end.  Explicit
    # --keep-tokens beats the profile's 127.
    rc = run_cli(["retrieve", "--path", str(tmp_path), "--synthetic",
                  "--profile", "turbo", "--keep-tokens", "6", "--k", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "token selection: serving 6 of" in out
    emb = tmp_path / "embeddings"
    # profile turbo implies --quantize: the index is int8-tagged
    assert any("int8" in f or "_q" in f for f in os.listdir(emb)) \
        or any("_kt6" in f for f in os.listdir(emb)), os.listdir(emb)


def test_train_hyp_cli_resume(tmp_path, capsys):
    """--resume continues train_hyp from the 'latest' checkpoint (the TRUE
    resume in train_hyp.py was previously unreachable from the CLI)."""
    rc = run_cli(["train_hyp", "--synthetic", "--path", str(tmp_path),
                  "--epochs", "2"])
    assert rc == 0
    capsys.readouterr()
    rc = run_cli(["train_hyp", "--synthetic", "--path", str(tmp_path),
                  "--epochs", "3", "--resume"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "resumed_from_epoch" in out


def test_index_prefix_identity_tags(tmp_path):
    """The index prefix isolates precision, pruning, encoder WEIGHTS, and
    corpus identity — a stale index from different weights or a different
    corpus at the same basename must never be silently loaded (r5 review:
    mixed-weights query/gallery spaces produce garbage rankings)."""
    from patent_tpu.retrieval.cli_actions import index_prefix

    base = index_prefix(str(tmp_path), "/corpora/a/test_gallery", False,
                        weights_tag="rand")
    assert index_prefix(str(tmp_path), "/corpora/a/test_gallery", True,
                        weights_tag="rand") != base          # precision
    assert index_prefix(str(tmp_path), "/corpora/a/test_gallery", False,
                        keep_tokens=127, weights_tag="rand") != base
    assert index_prefix(str(tmp_path), "/corpora/a/test_gallery", False,
                        weights_tag="ftdeadbeef") != base    # weights
    assert index_prefix(str(tmp_path), "/corpora/b/test_gallery", False,
                        weights_tag="rand") != base          # corpus
    # deterministic for the same identity
    assert index_prefix(str(tmp_path), "/corpora/a/test_gallery", False,
                        weights_tag="rand") == base


def test_build_encoder_rejects_bad_checkpoint(tmp_path):
    """A typo'd --checkpoint (or an HF hub id) must fail loudly, not fall
    through to other weights while the user believes their checkpoint was
    used (r5 review)."""
    import argparse

    from patent_tpu.retrieval.cli_actions import _build_encoder

    args = argparse.Namespace(keep_tokens=None, quantize=False,
                              path=str(tmp_path),
                              checkpoint="openai/clip-vit-base-patch16")
    with pytest.raises(ValueError, match="not a local directory"):
        _build_encoder(args, 32)
