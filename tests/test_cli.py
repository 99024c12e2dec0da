"""CLI runner tests (direct invocation; CPU mesh)."""

import json

import pytest

from binf_tpu.cli import main


@pytest.mark.slow
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


@pytest.mark.slow
def test_cli_hmc_with_mesh():
    out = main([
        "--model", "polynomial", "--algorithm", "hmc",
        "--chains", "64", "--warmup", "200", "--samples", "200", "--mesh",
    ])
    means = out["summary"]["coefficients"]["mean"]
    assert abs(means[1] + 4.0) < 0.6  # coefficient 1 truth is -4
    assert out["summary"]["precision"]["mean"] > 0


def test_cli_default_auto_routes_and_reports():
    """--algorithm auto is the default: the run reports which path the
    cost model chose and recovers the reference posterior."""
    out = main([
        "--model", "polynomial",
        "--chains", "64", "--warmup", "150", "--samples", "150",
    ])
    assert out["algorithm"] == "auto"
    assert out["routed_to"] == "fused"  # 64 chains -> small-batch rule
    assert "routing_reason" in out
    means = out["summary"]["coefficients"]["mean"]
    assert abs(means[1] + 4.0) < 0.8


@pytest.mark.slow
def test_cli_chain_grid_algorithm():
    """--algorithm chain-grid: the data-in-lanes kernel end to end."""
    out = main([
        "--model", "polynomial", "--algorithm", "chain-grid",
        "--chains", "32", "--warmup", "100", "--samples", "100",
    ])
    assert out["algorithm"] == "chain-grid"
    assert 0.5 < out["accept_rate"] <= 1.0
    means = out["summary"]["coefficients"]["mean"]
    assert abs(means[1] + 4.0) < 0.8


@pytest.mark.slow
def test_cli_nuts_rerouted_with_reason():
    """--algorithm nuts on a cheap density is rerouted to fixed-L HMC
    (measured 39-119x lockstep tree overhead, round 5) with the reason
    recorded; --no-reroute is the escape hatch."""
    out = main([
        "--model", "polynomial", "--algorithm", "nuts",
        "--chains", "32", "--warmup", "100", "--samples", "100",
    ])
    assert out["sampler"] == "hmc"
    assert "lockstep" in out["reroute_reason"]
    means = out["summary"]["coefficients"]["mean"]
    assert abs(means[1] + 4.0) < 0.8


@pytest.mark.slow
def test_cli_auto_forwards_fused_flags():
    """--algorithm auto must honor fused-only flags instead of silently
    dropping them (ADVICE round 4): a fused-routed run with
    --warmup-mode fused executes the in-kernel warmup path."""
    out = main([
        "--model", "polynomial", "--algorithm", "auto",
        "--chains", "64", "--warmup", "100", "--samples", "100",
        "--warmup-mode", "fused", "--block-chains", "64",
    ])
    assert out["routed_to"] == "fused"
    means = out["summary"]["coefficients"]["mean"]
    assert abs(means[1] + 4.0) < 0.8


def test_cli_auto_rejects_fused_flags_on_xla_route():
    """Fused-only flags + a shape that routes to XLA must error clearly,
    not silently ignore the flags (ADVICE round 4)."""
    with pytest.raises(ValueError, match="fused path only"):
        main([
            "--model", "hierarchical", "--algorithm", "auto",
            "--chains", "4096", "--warmup", "20", "--samples", "20",
            "--per-chain-step",
        ])


@pytest.mark.slow
def test_cli_auto_routes_hierarchical_large_batch_to_xla():
    out = main([
        "--model", "hierarchical", "--algorithm", "auto",
        "--chains", "4096", "--warmup", "30", "--samples", "30",
    ])
    assert out["routed_to"] == "xla"
    assert out["accept_rate"] > 0.2


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


@pytest.mark.slow
def test_cli_chees_hierarchical():
    out = main([
        "--model", "hierarchical", "--algorithm", "chees",
        "--chains", "32", "--warmup", "200", "--samples", "150",
    ])
    assert out["summary"]["mu"]["rhat"][0] < 1.3


def test_cli_unknown_model():
    with pytest.raises(SystemExit):
        main(["--model", "nope"])


@pytest.mark.slow
def test_cli_fused_polynomial():
    out = main([
        "--model", "polynomial", "--algorithm", "fused",
        "--chains", "64", "--warmup", "200", "--samples", "200",
    ])
    means = out["summary"]["coefficients"]["mean"]
    assert abs(means[1] + 4.0) < 0.6
    assert out["summary"]["precision"]["mean"] > 0
    assert 0.3 < out["accept_rate"] <= 1.0


@pytest.mark.slow
def test_cli_fused_hierarchical():
    out = main([
        "--model", "hierarchical", "--algorithm", "fused",
        "--chains", "32", "--warmup", "200", "--samples", "150",
    ])
    assert out["summary"]["mu"]["rhat"][0] < 1.3
    assert 0.3 < out["accept_rate"] <= 1.0


@pytest.mark.slow
def test_cli_logistic_nuts():
    out = main([
        "--model", "logistic", "--algorithm", "nuts", "--no-reroute",
        "--chains", "16", "--warmup", "300", "--samples", "300",
    ])
    means = out["summary"]["weights"]["mean"]
    assert abs(means[1] + 2.0) < 0.7  # TRUE_WEIGHTS[1] = -2.0
    assert out["summary"]["weights"]["rhat"][0] < 1.2


@pytest.mark.slow
def test_cli_statespace_fused():
    """statespace registered in the CLI (round-2 VERDICT item 7): the AR(1)
    model runs via the general fused path (lax.scan in the interpreter)."""
    out = main([
        "--model", "statespace", "--algorithm", "fused",
        "--chains", "32", "--warmup", "200", "--samples", "150",
    ])
    assert 0.3 < out["accept_rate"] <= 1.0
    assert out["summary"]["dynamics"]["rhat"][0] < 1.35


@pytest.mark.slow
def test_cli_mixture_hmc():
    """mixture registered in the CLI; logsumexp likelihood via HMC."""
    out = main([
        "--model", "mixture", "--algorithm", "hmc",
        "--chains", "32", "--warmup", "200", "--samples", "150",
    ])
    assert "means" in out["summary"]
    assert out["summary"]["log_sigma"]["rhat"] < 1.5


@pytest.mark.slow
def test_cli_fused_warmup_mode_and_moments():
    """--warmup-mode fused + --collect moments: one-dispatch adaptive run
    with in-kernel streaming moments."""
    out = main([
        "--model", "polynomial", "--algorithm", "fused",
        "--chains", "64", "--warmup", "300", "--samples", "300",
        "--warmup-mode", "fused", "--collect", "moments",
    ])
    assert out["space"] == "unconstrained"
    assert 0.3 < out["accept_rate"] <= 1.0
    means = out["posterior_means"]["coefficients"]
    assert abs(means[1] + 4.0) < 0.6


@pytest.mark.slow
def test_cli_hmc_dense_metric():
    """--metric dense: dense-mass HMC on the (correlated) polynomial
    posterior recovers the coefficients."""
    out = main([
        "--model", "polynomial", "--algorithm", "hmc", "--metric", "dense",
        "--chains", "64", "--warmup", "300", "--samples", "200",
    ])
    means = out["summary"]["coefficients"]["mean"]
    assert abs(means[1] + 4.0) < 0.6
    assert out["summary"]["precision"]["mean"] > 0


def test_cli_fused_dense_warmup():
    """--warmup-mode dense: full-covariance metric + fused sampling."""
    out = main([
        "--model", "polynomial", "--algorithm", "fused",
        "--warmup-mode", "dense", "--chains", "64",
        "--warmup", "300", "--samples", "200", "--block-chains", "32",
    ])
    assert out["accept_rate"] > 0.5
    means = out["summary"]["coefficients"]["mean"]
    assert abs(means[1] + 4.0) < 0.8


def test_cli_pathfinder():
    out = main(["--model", "polynomial", "--algorithm", "pathfinder",
                "--chains", "8"])
    assert out["pareto_k"] < 0.7
    assert abs(out["posterior_means"]["coefficients"][1] + 4.0) < 1.0


@pytest.mark.slow
def test_cli_pathfinder_init():
    """--init pathfinder: a short warmup suffices from typical-set starts."""
    out = main(["--model", "polynomial", "--algorithm", "hmc",
                "--init", "pathfinder", "--chains", "64",
                "--warmup", "100", "--samples", "200"])
    means = out["summary"]["coefficients"]["mean"]
    assert abs(means[1] + 4.0) < 0.8
