"""CutmixMixup semantics (reference callbacks.py:232-247)."""

import jax
import jax.numpy as jnp
import numpy as np

from sota_imagenet_tpu.train.steps import cutmix_mixup


def _batch(b=16, s=32, c=10, seed=0):
    rng = np.random.default_rng(seed)
    imgs = jnp.asarray(rng.normal(size=(b, s, s, 3)), jnp.float32)
    labels = jax.nn.one_hot(jnp.arange(b) % c, c)
    return imgs, labels


def test_labels_remain_distributions():
    imgs, labels = _batch()
    for seed in range(5):
        mi, ml = cutmix_mixup(jax.random.PRNGKey(seed), imgs, labels, 1.0, 0.2, prob=1.0)
        np.testing.assert_allclose(np.asarray(ml).sum(-1), 1.0, atol=1e-5)
        assert np.asarray(ml).min() >= 0


def test_prob_zero_is_identity():
    imgs, labels = _batch()
    mi, ml = cutmix_mixup(jax.random.PRNGKey(0), imgs, labels, 1.0, 0.2, prob=0.0)
    np.testing.assert_array_equal(np.asarray(mi), np.asarray(imgs))
    np.testing.assert_array_equal(np.asarray(ml), np.asarray(labels))


def test_cutmix_label_weight_matches_pixel_fraction():
    """When cutmix fires, the label mix must equal the pasted-box area
    fraction (exact lambda adjustment after clipping)."""
    imgs, labels = _batch(b=8, s=32)
    found = 0
    for seed in range(30):
        mi, ml = cutmix_mixup(jax.random.PRNGKey(seed), imgs, labels, 1.0, 0.2, prob=1.0)
        mi, ml = np.asarray(mi), np.asarray(ml)
        # detect cutmix (pixels exactly equal one of the two sources)
        src_a, src_b = np.asarray(imgs), np.asarray(imgs)[::-1]
        is_a = np.isclose(mi, src_a, atol=1e-6).all(-1)
        is_b = np.isclose(mi, src_b, atol=1e-6).all(-1)
        if not (is_a | is_b).all():
            continue  # this seed chose mixup
        found += 1
        frac_b = is_b[0].mean()  # fraction of pasted pixels, sample 0
        # label weight of the permuted source on sample 0
        w_b = ml[0][np.argmax(np.asarray(labels)[::-1][0])]
        if frac_b in (0.0, 1.0):
            continue
        assert abs(frac_b - w_b) < 0.02, (frac_b, w_b)
    assert found >= 3  # cutmix chosen ~50% of seeds


def test_mixup_blend():
    imgs, labels = _batch(b=4, s=8)
    for seed in range(30):
        mi, ml = cutmix_mixup(jax.random.PRNGKey(seed), imgs, labels, 1.0, 0.5, prob=1.0)
        mi = np.asarray(mi)
        src_a, src_b = np.asarray(imgs), np.asarray(imgs)[::-1]
        is_pure = np.isclose(mi, src_a, atol=1e-6).all(-1) | np.isclose(mi, src_b, atol=1e-6).all(-1)
        if is_pure.all():
            continue  # cutmix seed
        # mixup: every pixel is the same convex blend lam*a + (1-lam)*b
        lam_map = (mi - src_b) / np.where(np.abs(src_a - src_b) < 1e-6, np.nan, src_a - src_b)
        lam_vals = lam_map[np.isfinite(lam_map)]
        assert lam_vals.std() < 1e-3
        return
    raise AssertionError("no mixup seed found in 30 tries")


def test_choice_prob_selects_cutmix_or_mixup():
    """choice_prob=1.0 -> pure cutmix (pixels are exactly from one of the two
    sources); 0.0 -> pure mixup (global blend). Backs the standalone
    Cutmix/Mixup callbacks (reference pt_clb.Cutmix/Mixup)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sota_imagenet_tpu.train.steps import cutmix_mixup

    rng = jax.random.PRNGKey(0)
    images = jnp.stack([jnp.zeros((16, 16, 3)), jnp.ones((16, 16, 3))])
    labels = jnp.eye(2)
    for trial in range(4):
        k = jax.random.fold_in(rng, trial)
        cut_img, cut_lab = cutmix_mixup(k, images, labels, prob=1.0, choice_prob=1.0)
        a = np.asarray(cut_img)
        # cutmix: every pixel exactly 0 or 1
        assert np.all((np.abs(a) < 1e-6) | (np.abs(a - 1) < 1e-6)), trial
        # label weight equals the pasted area fraction
        area = np.mean(a[0, ..., 0])
        np.testing.assert_allclose(float(cut_lab[0, 1]), area, atol=1e-5)

        mix_img, _ = cutmix_mixup(k, images, labels, mixup_alpha=0.4, prob=1.0, choice_prob=0.0)
        m = np.asarray(mix_img)
        # mixup: spatially constant blend per sample
        assert np.allclose(m[0], m[0, 0, 0], atol=1e-6), trial


def test_zero_alpha_disables_branch_without_nan():
    """alpha=0 disables that transform (legacy cutmix-only configs,
    e.g. old_exp CutmixMixup(mixup_alpha=0)): Beta(0,0) samples NaN and the
    unchosen where() branch must not poison labels on any seed."""
    imgs, labels = _batch()
    for seed in range(8):
        mi, ml = cutmix_mixup(jax.random.PRNGKey(seed), imgs, labels, cutmix_alpha=1.0, mixup_alpha=0.0, prob=1.0)
        assert np.isfinite(np.asarray(mi)).all() and np.isfinite(np.asarray(ml)).all()
        np.testing.assert_allclose(np.asarray(ml).sum(-1), 1.0, atol=1e-5)
        mi, ml = cutmix_mixup(jax.random.PRNGKey(seed), imgs, labels, cutmix_alpha=0.0, mixup_alpha=0.2, prob=1.0)
        assert np.isfinite(np.asarray(mi)).all() and np.isfinite(np.asarray(ml)).all()
    # both disabled: identity
    mi, ml = cutmix_mixup(jax.random.PRNGKey(0), imgs, labels, cutmix_alpha=0.0, mixup_alpha=0.0, prob=1.0)
    np.testing.assert_array_equal(np.asarray(mi), np.asarray(imgs))
    np.testing.assert_array_equal(np.asarray(ml), np.asarray(labels))
