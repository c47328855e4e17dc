"""Memory-planner tests (drnmf_tpu/utils/memplan.py)."""
import numpy as np
import pytest

from drnmf_tpu.models import DRNMFConfig, init_drnmf_params
from drnmf_tpu.utils.memplan import (drnmf_param_shapes, plan_memory,
                                     _fsdp_local_elems)


@pytest.mark.parametrize("kw", [
    dict(),
    dict(params_untied=("log_D", "log_alph", "log_lam1"), untie_alph=True),
    dict(params_untied=(), K_layers=4),
    dict(nonnegative=False),
])
def test_param_shapes_match_init(kw, rng):
    """The analytic shape map equals init_drnmf_params' actual shapes for
    tied/untied/vector-alph/plain-h0 configurations."""
    f, r = 11, 6
    config = DRNMFConfig(input_dim=f, r=r, output_dim=f,
                         K_layers=kw.pop("K_layers", 2),
                         alph=10.0, lam1=0.2, **kw)
    w = rng.uniform(0.05, 1.0, (f, 2 * r)).astype(np.float32)
    params = init_drnmf_params(config, w)
    shapes = drnmf_param_shapes(config)
    assert set(shapes) == set(params)
    for k in params:
        assert tuple(shapes[k]) == tuple(params[k].shape), k


def test_plan_memory_fsdp_divides():
    """FSDP per-device bytes = replicated/dp for every tensor above the
    floor with a divisible dim; Adam moments only on trainables."""
    config = DRNMFConfig(input_dim=257, r=1000, output_dim=257, K_layers=5,
                         alph=10.0, lam1=0.5,
                         params_untied=("log_D", "log_alph"),
                         params_trainable=("log_D", "log_alph"),
                         untie_alph=True)
    rep = plan_memory(config, n_dp=8, fsdp=False)
    fs = plan_memory(config, n_dp=8, fsdp=True)
    u1 = rep["per_tensor"]["log_U1"]
    assert not u1["trainable"] and u1["moment_bytes"] == 0
    # the (2000, 2000) frozen U tensors shard 8x
    assert fs["per_tensor"]["log_U1"]["param_bytes"] == u1["param_bytes"] // 8
    # big savings overall (most bytes are dp-divisible 2r-sized tensors)
    assert fs["total"] < rep["total"] / 4
    # tiny tensors replicate: scalars cost the same in both layouts
    assert (fs["per_tensor"]["log_lam1_0"]["param_bytes"]
            == rep["per_tensor"]["log_lam1_0"]["param_bytes"]
            if "log_lam1_0" in rep["per_tensor"] else True)
    assert _fsdp_local_elems((7, 13), 8, 1) == 7 * 13  # indivisible


def test_memplan_cli(tmp_path, capsys):
    import yaml
    from drnmf_tpu.utils import memplan

    cfg = tmp_path / "params_unfolded_snmf_m.yaml"
    yaml.safe_dump({"K_layers": 5, "r": 1000, "alph": 7.5, "lam1": 5.0,
                    "params_untied": ["log_D", "log_alph"],
                    "params_trainable": ["log_D", "log_alph"]},
                   open(cfg, "w"))
    memplan.main(["-c", str(cfg), "--dp", "8", "--fsdp"])
    out = capsys.readouterr().out
    assert "layout=fsdp dp=8" in out
    assert "per-device total" in out
