"""End-to-end golden tests on real data: short nltcs runs must land in the
known PLL band (reference best_so_far -5.246 at 100 epochs,
data/trw/SUMMARY.txt; paper -4.98, baseline.py:7), and the CLI must preserve
the reference's result.txt contract."""

import os
import subprocess
import sys

import numpy as np
import jax

from pgmvae_tpu.data import load_split
from pgmvae_tpu.models import VqVaeConfig
from pgmvae_tpu.stage2 import Stage2
from pgmvae_tpu.train import Trainer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_nltcs_golden_pll():
    y_train = load_split('nltcs', 'train')
    y_test = load_split('nltcs', 'test')
    cfg = VqVaeConfig(n_var=16, units=(15, 14, 13, 12), dim=10, num_codes=50,
                      cost=0.25, decay=0.99, quantizer='ema')
    tr = Trainer(cfg, 0.01, 128, len(y_train))
    st = tr.init_state(jax.random.PRNGKey(1))
    st, _ = tr.fit(st, y_train, 12, jax.random.PRNGKey(1))
    s2 = Stage2(cfg)
    dist = s2.cpt(st.params, tr.codebook(st), y_train)
    pll = s2.pseudo_log_likelihood(st.params, tr.codebook(st), y_test, dist)
    # 12 epochs on CPU: inside the converged band, well above untrained
    assert -5.8 < pll < -4.9, pll


def test_cli_result_line(tmp_path):
    res = tmp_path / 'result.txt'
    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)
    out = subprocess.run(
        [sys.executable, 'run.py', '-n', 'nltcs', '-k', '20', '-d', '6',
         '-b', '256', '-e', '2', '-r', '0.01', '-m', '-s', '3',
         '--device', '-1', '--note', 'citest',
         '--result-file', str(res)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    line = res.read_text().strip()
    # identifier format field-for-field (reference run.py:38,77)
    assert line.startswith(
        'nltcs_K-20_D-6_bs-256_epk-2_lr-0.01_bta-0.25_ema-True_gma-0.99'
        '_sd-3-citest'), line
    for fld in (' pll-train:', ' pll-valid:', ' pll-test:', ' cmll-test:1'):
        assert fld in line, line
    pll_test = float(line.split('pll-test:')[1].split()[0])
    assert -16 * np.log(2) - 1 < pll_test < 0  # sane PLL for 16 binary vars
    assert out.stdout.strip().endswith(line)
