"""CLI runner tests (direct invocation; CPU mesh)."""

import json

import pytest

from binf_tpu.cli import main


def test_cli_polynomial_gibbs(tmp_path, capsys):
    out = main([
        "--model", "polynomial", "--algorithm", "gibbs",
        "--chains", "64", "--samples", "200",
        "--summary-out", str(tmp_path / "s.json"),
    ])
    assert out["algorithm"] == "gibbs"
    stats = out["summary"]
    assert abs(stats["precision"]["mean"] - 2.5) < 1.5
    assert stats["precision"]["rhat"] < 1.1
    saved = json.loads((tmp_path / "s.json").read_text())
    assert saved["chains"] == 64


def test_cli_hmc_with_mesh():
    out = main([
        "--model", "polynomial", "--algorithm", "hmc",
        "--chains", "64", "--warmup", "200", "--samples", "200", "--mesh",
    ])
    means = out["summary"]["coefficients"]["mean"]
    assert abs(means[1] + 4.0) < 0.6  # coefficient 1 truth is -4
    assert out["summary"]["precision"]["mean"] > 0


def test_cli_smc():
    out = main([
        "--model", "polynomial", "--algorithm", "smc", "--chains", "512",
    ])
    assert out["num_stages"] > 2
    assert abs(out["posterior_means"]["coefficients"][1] + 4.0) < 0.6


def test_cli_advi():
    out = main([
        "--model", "polynomial", "--algorithm", "advi", "--samples", "400",
    ])
    assert abs(out["posterior_means"]["coefficients"][1] + 4.0) < 0.6


def test_cli_chees_hierarchical():
    out = main([
        "--model", "hierarchical", "--algorithm", "chees",
        "--chains", "32", "--warmup", "200", "--samples", "150",
    ])
    assert out["summary"]["mu"]["rhat"][0] < 1.3


def test_cli_unknown_model():
    with pytest.raises(SystemExit):
        main(["--model", "nope"])


def test_cli_fused_polynomial():
    out = main([
        "--model", "polynomial", "--algorithm", "fused",
        "--chains", "64", "--warmup", "200", "--samples", "200",
    ])
    means = out["summary"]["coefficients"]["mean"]
    assert abs(means[1] + 4.0) < 0.6
    assert out["summary"]["precision"]["mean"] > 0
    assert 0.3 < out["accept_rate"] <= 1.0


def test_cli_fused_hierarchical():
    out = main([
        "--model", "hierarchical", "--algorithm", "fused",
        "--chains", "32", "--warmup", "200", "--samples", "150",
    ])
    assert out["summary"]["mu"]["rhat"][0] < 1.3
    assert 0.3 < out["accept_rate"] <= 1.0


def test_cli_logistic_nuts():
    out = main([
        "--model", "logistic", "--algorithm", "nuts",
        "--chains", "16", "--warmup", "300", "--samples", "300",
    ])
    means = out["summary"]["weights"]["mean"]
    assert abs(means[1] + 2.0) < 0.7  # TRUE_WEIGHTS[1] = -2.0
    assert out["summary"]["weights"]["rhat"][0] < 1.2
