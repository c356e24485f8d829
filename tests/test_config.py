"""Config parameters.txt round-trip, including the real reference file.

The fixture is a verbatim copy of the reference's shipped
`results/Log_circleloss/parameters.txt` (config *data*, vendored the same
way as the gt fixtures) — loading it proves checkpoint-dir compatibility
with the reference's text format (`utils/config.py:180-314`).
"""

import os

from d3feat_tpu.config import Config, threedmatch_config

FIXTURE = os.path.join(os.path.dirname(__file__), 'fixtures',
                       'reference_circleloss_parameters.txt')


def test_reference_parameters_txt_loads():
    cfg = Config.load(FIXTURE)
    assert cfg.dataset == '3DMatch'
    assert cfg.num_kernel_points == 15
    assert cfg.first_subsampling_dl == 0.03
    assert cfg.density_parameter == 5.0
    assert cfg.KP_influence == 'linear'
    assert cfg.convolution_mode == 'sum'
    assert cfg.first_features_dim == 64
    assert cfg.batch_norm_momentum == 0.98
    assert cfg.num_layers == 5
    assert len(cfg.architecture) == 19
    assert cfg.architecture[0] == 'simple'
    assert cfg.architecture[-1] == 'last_unary'
    assert cfg.learning_rate == 0.05
    assert cfg.momentum == 0.98
    assert cfg.lr_decays[1] == 0.971628
    assert cfg.lr_decays[199] == 0.971628
    assert cfg.grad_clip_norm == 100.0
    assert cfg.augment_noise == 0.005
    assert cfg.augment_rotation == 1
    assert cfg.augment_scale_min == 0.9
    assert cfg.augment_scale_max == 1.1
    assert cfg.weights_decay == 1e-6
    assert cfg.batch_num == 1
    assert cfg.max_epoch == 200
    assert cfg.epoch_steps == 3402


def test_roundtrip_preserves_fields(tmp_path):
    cfg = threedmatch_config(max_points=4096, keypts_num=64)
    path = os.path.join(tmp_path, 'parameters.txt')
    cfg.save(path)
    back = Config.load(path)
    assert back == cfg


def test_reference_file_roundtrips(tmp_path):
    cfg = Config.load(FIXTURE)
    path = os.path.join(tmp_path, 'parameters.txt')
    cfg.save(path)
    assert Config.load(path) == cfg
