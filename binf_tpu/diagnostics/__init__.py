from binf_tpu.diagnostics.rhat import ess, split_rhat, summary

__all__ = ["ess", "split_rhat", "summary"]
