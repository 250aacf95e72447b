"""CLI (tpugnn.cli) end-to-end on tiny CPU configs."""

import json
import os

import numpy as np
import pytest

from tpugnn import cli

TINY = ["--family", "repetition", "-d", "5", "--hidden", "8",
        "--msg-hidden", "8", "--rounds", "2", "--batch", "32",
        "--steps", "6", "--eval-every", "3", "--eval-shots", "64"]


def _run(capsys, *argv) -> list[dict]:
    rc = cli.main(list(argv))
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    return [json.loads(x) for x in out if x.startswith("{")]


def test_train_eval_sweep_serve_roundtrip(tmp_path, capsys):
    ck = os.path.join(str(tmp_path), "ck")

    rows = _run(capsys, "train", *TINY, "--checkpoint-dir", ck,
                "--qubit-head", "pauli4")
    assert "loss" in rows[-1]

    rows = _run(capsys, "eval", *TINY, "--checkpoint-dir", ck,
                "--qubit-head", "pauli4", "--shots", "256")
    assert rows[-1]["d"] == 5 and "ler" in rows[-1]

    rows = _run(capsys, "sweep", *TINY, "--checkpoint-dir", ck,
                "--qubit-head", "pauli4", "--shots", "128",
                "--ps", "0.01", "0.05", "--baseline")
    assert [r["p"] for r in rows] == [0.01, 0.05]
    assert all("uf_ler" in r and "mwpm_ler" in r for r in rows)

    # serve: demo batch (no --in)
    rows = _run(capsys, "serve", *TINY, "--checkpoint-dir", ck,
                "--qubit-head", "pauli4", "--max-batch", "32")
    assert rows[-1]["shots"] == 32 and rows[-1]["shots_per_s"] > 0

    # serve: file in/out roundtrip
    syn = (np.random.default_rng(0).random((16, 4)) < 0.2).astype(np.uint8)
    inp = os.path.join(str(tmp_path), "syn.npy")
    outp = os.path.join(str(tmp_path), "corr.npy")
    np.save(inp, syn)
    rows = _run(capsys, "serve", *TINY, "--checkpoint-dir", ck,
                "--qubit-head", "pauli4", "--max-batch", "32",
                "--in", inp, "--out", outp)
    assert rows[-1]["out"] == outp
    corr = np.load(outp)
    assert corr.shape == (16, 5, 2) and corr.dtype == np.uint8


def test_spacetime_flags(capsys):
    rows = _run(capsys, "train", "--family", "repetition", "-d", "3",
                "--hidden", "8", "--msg-hidden", "8", "--rounds", "2",
                "--batch", "32", "--steps", "4", "--eval-every", "4",
                "--eval-shots", "64", "--dt", "2")
    assert "loss" in rows[-1]


def test_bad_family_rejected():
    with pytest.raises(SystemExit):
        cli.main(["train", "--family", "nope"])
