"""utils/report.py helpers (reference ldm/util.py counterparts)."""

import numpy as np

from stedm_tpu.utils.report import count_params, log_txt_as_img


def test_log_txt_as_img_shape_range_and_wrap():
    # reference ldm/util.py:17-38: white canvas, black text, [-1,1] range,
    # wrap at int(40 * w/256) chars
    out = log_txt_as_img((128, 64), ["hello world", "x" * 100])
    assert out.shape == (2, 64, 128, 3)  # NHWC here (reference is NCHW)
    assert out.dtype == np.float32
    assert out.max() <= 1.0 and out.min() >= -1.0
    # text was actually drawn: not all-white
    assert (out < 0.99).any()
    # mostly white background
    assert (out > 0.99).mean() > 0.5


def test_count_params_grouped():
    params = {"unet": {"w": np.zeros((10, 10))}, "agg": {"b": np.zeros((5,))}}
    assert count_params(params, verbose=False) == 105
