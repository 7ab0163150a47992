"""Semantic segmentation metrics: confusion matrix, mIoU, per-class accuracy."""
import numpy as np
def test_miou_and_class_accuracy():
    import jax.numpy as jnp
    from nerf_siren_tpu.training.metrics import (
        class_accuracy, confusion_matrix, miou)

    gt = jnp.asarray([0, 0, 1, 1, 2, 2])
    pred = jnp.asarray([0, 1, 1, 1, 2, 0])
    cm = np.asarray(confusion_matrix(pred, gt, 3))
    assert cm.sum() == 6 and cm[0, 0] == 1 and cm[0, 1] == 1 and cm[1, 1] == 2

    m, iou = miou(pred, gt, 3)
    # class0: inter 1, union 3 (2 gt + 2 pred - 1); class1: 2/3; class2: 1/2
    np.testing.assert_allclose(np.asarray(iou), [1 / 3, 2 / 3, 1 / 2], atol=1e-6)
    np.testing.assert_allclose(float(m), (1 / 3 + 2 / 3 + 1 / 2) / 3, atol=1e-6)

    acc, per_cls = class_accuracy(pred, gt, 3)
    np.testing.assert_allclose(float(acc), 4 / 6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(per_cls), [0.5, 1.0, 0.5], atol=1e-6)

    # ignore_index drops those pixels entirely
    m2, _ = miou(pred, gt.at[0].set(5), 3, ignore_index=5)
    assert np.isfinite(float(m2))

    # a class absent from gt AND pred is excluded from the mean (nan)
    m3, iou3 = miou(jnp.asarray([0, 0]), jnp.asarray([0, 0]), 3)
    assert np.isnan(np.asarray(iou3)[1]) and float(m3) == 1.0
