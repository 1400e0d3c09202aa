"""Metric logging: tensorboardX when available (same tag names as the
reference so runs are comparable side-by-side), JSONL fallback otherwise.

Reference tags (lie_vae/experiments/unsupervised.py:122-149):
train_loss/train_recon/train_kl, test_loss/test_recon/test_kl, beta,
equivariance(+_lamb), encoder_continuity(+_lamb), parameter histograms.
"""
import json
import os


class MetricWriter:
    def __init__(self, log_dir=None):
        self.log_dir = log_dir
        self._tb = None
        self._jsonl = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(log_dir)
            except Exception:
                pass
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")

    def add_scalar(self, tag, value, step):
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)
        if self._jsonl is not None:
            self._jsonl.write(json.dumps(
                {"tag": tag, "value": float(value), "step": int(step)}) + "\n")

    def add_histogram(self, tag, values, step):
        if self._tb is not None:
            self._tb.add_histogram(tag, values, step, "auto")

    def flush(self):
        if self._tb is not None:
            self._tb.flush()
        if self._jsonl is not None:
            self._jsonl.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
        if self._jsonl is not None:
            self._jsonl.close()
