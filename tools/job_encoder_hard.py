"""TPU worker job: round-5 hard-negative continued fine-tune of the 24L
production encoder (train/encoder_hard.py). Drop into /tmp/tpu_jobs.

Resumable: if the tunnel stalls and the job is resubmitted, it continues
from /tmp/encoder_hard_ckpt (checkpoint every 500 steps)."""

import logging
import os
import sys

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")
logging.basicConfig(level=logging.INFO, force=True)

from rassengine_tpu.train.encoder_hard import main  # noqa: E402

result = main(
    init_from="/root/repo/encoder_model_prod24",
    out="/root/repo/encoder_model_prod24",
    work_dir="/tmp/encoder_hard_ckpt",
    n_triples=120_000,
    phase1_steps=2500,
    phase2_steps=4500,
    batch=96,
    learning_rate=1.5e-4,
    ckpt_every=500,
)
print("RESULT", result)
