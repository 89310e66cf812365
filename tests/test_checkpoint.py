"""Checkpoint/resume artifacts (task-list text format task.c:60-111,
distance-matrix npz): round-trips plus an actual RESUME — aligning from
checkpointed tree/distances must equal the uncheckpointed run."""

import os

import numpy as np

from kalign_tpu import checkpoint as ckpt
from kalign_tpu import engine as E
from kalign_tpu.core import io as kio

from conftest import DATA, GOLDEN


def test_task_list_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    tasks = rng.integers(0, 100, size=(17, 3)).astype(np.int32)
    path = tmp_path / "tasks.txt"
    ckpt.write_tasks(tasks, str(path))
    back = ckpt.read_tasks(str(path))
    assert np.array_equal(back, tasks)
    # reference text format: first line count, then a,b,c,p,n rows
    lines = path.read_text().splitlines()
    assert lines[0] == "17"
    assert len(lines) == 18
    assert all(len(l.split(",")) == 5 for l in lines[1:])


def test_distance_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    dm = rng.normal(size=(12, 8)).astype(np.float32)
    sd = rng.normal(size=12).astype(np.float32)
    anchors = np.array([0, 5, 7], dtype=np.int32)
    path = tmp_path / "dist.npz"
    ckpt.save_distances(str(path), dm, sd, anchors)
    dm2, sd2, a2 = ckpt.load_distances(str(path))
    assert np.array_equal(dm, dm2)
    assert np.array_equal(sd, sd2)
    assert np.array_equal(anchors, a2)


def test_resume_from_checkpointed_tree(tmp_path):
    """Full resume: checkpoint the guide-tree phase artifacts, reload
    them in a fresh pipeline, and verify the resumed alignment is
    byte-identical to the end-to-end golden."""
    from kalign_tpu.core import alphabet as alpha
    from kalign_tpu.core.msa import BIOTYPE_DNA, ALN_STATUS_ALIGNED

    def dist_alpha(m):
        return (alpha.ALPHA_DEFAULT_DNA if m.biotype == BIOTYPE_DNA
                else alpha.ALPHA_REDUCED_PROTEIN)

    def full_alpha(m):
        return (alpha.ALPHA_DEFAULT_DNA if m.biotype == BIOTYPE_DNA
                else alpha.ALPHA_AMBIGUOUS_PROTEIN)

    # ---- phase 1: distances + tree, checkpoint, stop ----
    msa = kio.read_inputs([os.path.join(DATA, "small.fa")])
    eng = E.get_engine("host")
    msa.essential_input_check()
    msa.dealign()
    msa.sort_len_name()
    msa.encode(dist_alpha(msa))
    anchors = E.pick_anchors(msa)
    codes = [sq.s for sq in msa.sequences]
    dm = eng.anchor_distances(codes, anchors)
    tasks, seq_dist = eng.build_tree(codes, dm, len(anchors))
    ckpt.save_distances(str(tmp_path / "d.npz"), dm, seq_dist, anchors)
    ckpt.write_tasks(tasks, str(tmp_path / "t.txt"))

    # ---- phase 2 (fresh objects): reload and finish the pipeline ----
    dm2, seq_dist2, _ = ckpt.load_distances(str(tmp_path / "d.npz"))
    tasks2 = ckpt.read_tasks(str(tmp_path / "t.txt"))
    msa2 = kio.read_inputs([os.path.join(DATA, "small.fa")])
    eng2 = E.get_engine("host")
    msa2.essential_input_check()
    msa2.dealign()
    msa2.sort_len_name()
    msa2.seq_distances = seq_dist2
    msa2.encode(full_alpha(msa2))
    ap = E.resolve_params(msa2, 0, -1.0, -1.0, -1.0, 1)
    ap.consistency_anchors = 5
    ap.consistency_weight = 2.0
    codes2 = [sq.s for sq in msa2.sequences]
    gaps, conf = eng2.align(codes2, tasks2, ap, seq_dist2,
                            cons_seq_distances=seq_dist2)
    for sq, g in zip(msa2.sequences, gaps):
        sq.gaps = g
    msa2.aligned = ALN_STATUS_ALIGNED
    msa2.finalise()
    msa2.sort_rank()

    gold = open(os.path.join(GOLDEN, "small.default.afa")).read()
    assert kio.write_fasta(msa2) == gold


def test_cli_checkpoint_save_resume(tmp_path):
    """--save-checkpoint then --resume-checkpoint must reproduce the
    direct run byte-identically while skipping the distance/tree
    phase."""
    import os
    from kalign_tpu import cli
    from conftest import DATA

    ck = str(tmp_path / "ck")
    out1 = str(tmp_path / "a.afa")
    out2 = str(tmp_path / "b.afa")
    inp = os.path.join(DATA, "small.fa")
    assert cli.main(["-i", inp, "-o", out1, "-q",
                     "--save-checkpoint", ck]) == 0
    assert os.path.exists(os.path.join(ck, "tasks.txt"))
    assert os.path.exists(os.path.join(ck, "distances.npz"))
    assert cli.main(["-i", inp, "-o", out2, "-q",
                     "--resume-checkpoint", ck]) == 0
    assert open(out1).read() == open(out2).read()


def test_resume_checkpoint_mismatch_raises(tmp_path):
    import os
    import pytest
    from kalign_tpu import cli
    from conftest import DATA

    ck = str(tmp_path / "ck")
    cli.main(["-i", os.path.join(DATA, "small.fa"), "-o",
              str(tmp_path / "x.afa"), "-q", "--save-checkpoint", ck])
    with pytest.raises(ValueError):
        cli.main(["-i", os.path.join(DATA, "tiny.fa"), "-o",
                  str(tmp_path / "y.afa"), "-q",
                  "--resume-checkpoint", ck])


def test_resume_checkpoint_fingerprint_rejects_same_count(tmp_path):
    """A checkpoint from DIFFERENT input with the SAME sequence count
    must be rejected (input fingerprint stored in distances.npz)."""
    import os
    import pytest
    from kalign_tpu import cli
    from kalign_tpu.core import io as kio

    a = tmp_path / "a.fa"
    b = tmp_path / "b.fa"
    a.write_text(">s1\nMKVLITTAGG\n>s2\nMKVLITAAGG\n>s3\nMKVLITTAGA\n")
    b.write_text(">s1\nMKVLITTAGG\n>s2\nMKVLITAAGG\n>s3\nMKVLITTAGW\n")
    ck = str(tmp_path / "ck")
    assert cli.main(["-i", str(a), "-o", str(tmp_path / "a.afa"), "-q",
                     "--save-checkpoint", ck]) == 0
    with pytest.raises(ValueError, match="fingerprint"):
        cli.main(["-i", str(b), "-o", str(tmp_path / "b.afa"), "-q",
                  "--resume-checkpoint", ck])
