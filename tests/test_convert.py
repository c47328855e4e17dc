"""Keras-HDF5 weight import: write a checkpoint in the reference's exact
save_weights layout, import it, and run the model."""

import h5py
import numpy as np

from drnmf_tpu.models import (
    DRNMFConfig,
    init_drnmf_params,
    drnmf_apply,
    LSTMConfig,
    init_lstm_params,
    lstm_apply,
)
from drnmf_tpu.utils.convert import (
    import_drnmf_keras_weights,
    import_lstm_keras_weights,
)


def write_keras_h5(path, layers):
    """layers: list of (layer_name, [(weight_name, array), ...]) in the
    Keras 2.0.4 save_weights layout."""
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.array(
            [name.encode() for name, _ in layers]
        )
        for name, weights in layers:
            grp = f.create_group(name)
            grp.attrs["weight_names"] = np.array(
                [wn.encode() for wn, _ in weights]
            )
            for wn, arr in weights:
                grp.create_dataset(wn, data=arr)


def test_import_drnmf_roundtrip(tmp_path, rng):
    f, r, K = 9, 3, 2
    w = rng.uniform(0.05, 1.0, (f, 2 * r)).astype(np.float32)
    w /= np.sqrt(np.sum(w**2, axis=0))
    config = DRNMFConfig(input_dim=f, r=r, output_dim=f, K_layers=K,
                         alph=10.0, lam1=0.5,
                         params_untied=("log_D", "log_alph"))
    params = init_drnmf_params(config, w)
    # perturb so the import is distinguishable from re-init
    params = {k: np.asarray(v) + 0.01 for k, v in params.items()}

    rnn = "simple_deep_rnn_1"
    rnn_weights = [(f"{rnn}_log_h0", params["log_h0"]),
                   (f"{rnn}_log_U1", params["log_U1"]),
                   (f"{rnn}_log_Uk", params["log_Uk"])]
    for k in range(K):
        rnn_weights.append((f"{rnn}_log_D_{k}", params[f"log_D_{k}"]))
        rnn_weights.append((f"{rnn}_log_alph_{k}", params[f"log_alph_{k}"]))
    rnn_weights.append((f"{rnn}_log_lam1", params["log_lam1"]))
    path = str(tmp_path / "model_unfolded_snmf_abc.hdf5")
    write_keras_h5(path, [
        ("masking_1", []),
        (rnn, rnn_weights),
        ("clean_est", [("clean_est/kernel:0", params["log_W_clean"])]),
        ("noise_est", [("noise_est/kernel:0", params["log_W_noise"])]),
    ])

    imported = import_drnmf_keras_weights(path)
    assert set(imported) == set(params)
    for k in params:
        np.testing.assert_array_equal(imported[k], params[k])
    # imported weights drive the model
    x = rng.uniform(0, 1, (2, 5, f)).astype(np.float32)
    irm = np.asarray(drnmf_apply(
        {k: np.asarray(v) for k, v in imported.items()}, config, x))
    assert np.all((irm >= 0) & (irm <= 1))


def test_import_lstm_roundtrip(tmp_path, rng):
    config = LSTMConfig(input_dim=7, hidden_dim=5, output_dim=7, K_layers=2)
    params = {k: np.asarray(v) for k, v in init_lstm_params(config).items()}

    path = str(tmp_path / "model_lstm_abc.hdf5")
    write_keras_h5(path, [
        ("masking_1", []),
        ("lstm_1", [("lstm_1/kernel:0", params["lstm0_Wx"]),
                    ("lstm_1/recurrent_kernel:0", params["lstm0_Wh"]),
                    ("lstm_1/bias:0", params["lstm0_b"])]),
        ("lstm_2", [("lstm_2/kernel:0", params["lstm1_Wx"]),
                    ("lstm_2/recurrent_kernel:0", params["lstm1_Wh"]),
                    ("lstm_2/bias:0", params["lstm1_b"])]),
        ("time_distributed_1", [
            ("time_distributed_1/kernel:0", params["dense_W"]),
            ("time_distributed_1/bias:0", params["dense_b"]),
        ]),
    ])
    imported = import_lstm_keras_weights(path)
    assert set(imported) == set(params)
    for k in params:
        np.testing.assert_array_equal(imported[k], params[k])
    x = rng.uniform(0, 1, (2, 4, 7)).astype(np.float32)
    mask_out = np.asarray(lstm_apply(imported, config, x))
    assert np.all((mask_out >= 0) & (mask_out <= 1))


def test_import_rejects_wrong_file(tmp_path):
    import pytest

    path = str(tmp_path / "other.hdf5")
    write_keras_h5(path, [("dense_1", [("dense_1/kernel:0",
                                        np.zeros((3, 3), np.float32))])])
    with pytest.raises(ValueError, match="does not look like"):
        import_drnmf_keras_weights(path)
    with pytest.raises(ValueError, match="does not look like"):
        import_lstm_keras_weights(path)
