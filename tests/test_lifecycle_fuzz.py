"""Randomized input-lifecycle stress for discovery: a seeded sequence
of GROW (in-place append), ROTATE (rewrite in place), REMOVE, and ADD
mutations, with crashes injected mid-run — after every step the
incremental pipeline's routed table must equal a single-shot run over
the CURRENT state of the input directory, and a follow-up rescan must
be a no-op.

The directed suites (tests/test_append_fastpath.py,
tests/test_rotation_removal.py) pin each transition individually;
this one exercises their COMPOSITIONS — grow-after-grow chains
interleaved with rotations of sibling files, removal of a previously
grown file (which must retire its append batches too), new files
appearing in the same scan as an append, and crash/resume landing
between any of them. One seeded trajectory, fully reproducible."""

import os
import random

from tests.conftest import assert_same_rows
from ves_spark.pipeline import Pipeline, PipelineConfig
from ves_spark.synth import (
    grow_sequences_file,
    write_fixture,
    write_sequences_file,
)

COLS = ["doc_id", "sink", "source", "n_tok", "tokens"]


def _conf(fix, out, run_id, **kw):
    kw.setdefault("n_units", 4)
    kw.setdefault("units_per_increment", 4)
    return PipelineConfig(
        sequences_path=os.path.join(fix, "sequences.parquet"),
        source_meta_path=os.path.join(fix, "source_meta.parquet"),
        route_rules_path=os.path.join(fix, "route_rules.parquet"),
        out_dir=out,
        run_id=run_id,
        **kw,
    )


def test_randomized_lifecycle_matches_single_shot(spark, tmp_path):
    rng = random.Random(606)
    fix = str(tmp_path / "fix")
    write_fixture(fix, 2_000, seed=41, sequences_as_dir=True)
    seq_dir = os.path.join(fix, "sequences.parquet")
    write_sequences_file(
        os.path.join(seq_dir, "part-00001.parquet"), 1_500, seed=42,
        start_row=2_000,
    )
    out = str(tmp_path / "out")
    Pipeline(spark, _conf(fix, out, "init")).run()

    next_row = 4_000
    new_file_i = 2
    trajectory = []
    for step in range(8):
        files = sorted(os.listdir(seq_dir))
        ops = ["grow", "grow", "add", "rotate"]
        if len(files) > 1:
            ops.append("remove")
        op = rng.choice(ops)
        target = os.path.join(seq_dir, rng.choice(files))
        n = rng.randrange(200, 900)
        if op == "grow":
            grow_sequences_file(target, n, seed=100 + step, start_row=next_row)
            next_row += n
        elif op == "add":
            path = os.path.join(
                seq_dir, f"part-{new_file_i:05d}.parquet"
            )
            new_file_i += 1
            write_sequences_file(path, n, seed=200 + step, start_row=next_row)
            next_row += n
            target = path  # record the file actually added, not the rng pick
        elif op == "rotate":
            write_sequences_file(target, n, seed=300 + step, start_row=next_row)
            next_row += n
        else:
            os.remove(target)
        crashed = rng.random() < 0.4
        trajectory.append((op, os.path.basename(target), crashed))

        if crashed:
            crashy = Pipeline(
                spark,
                _conf(fix, out, f"x{step}", units_per_increment=1),
            )
            try:
                crashy.run(fail_after_units=1)
            except RuntimeError:
                pass  # simulated crash mid-increment

        p = Pipeline(spark, _conf(fix, out, f"r{step}"))
        p.run()
        # rescan with nothing changed: no-op
        noop = Pipeline(spark, _conf(fix, out, f"n{step}")).run()
        assert noop["units_processed"] == 0, (step, trajectory)

        single = Pipeline(
            spark, _conf(fix, str(tmp_path / f"single-{step}"), f"s{step}")
        )
        single.run()
        try:
            assert_same_rows(
                p.routed().select(*COLS).toPandas(),
                single.routed().select(*COLS).toPandas(),
            )
        except AssertionError as e:
            raise AssertionError((step, trajectory)) from e

    # the seeded trajectory must actually exercise the interesting ops
    seen_ops = {t[0] for t in trajectory}
    assert {"grow", "rotate"} <= seen_ops, trajectory
    assert any(t[2] for t in trajectory), trajectory
