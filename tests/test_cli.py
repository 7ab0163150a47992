"""End-to-end CLI tests: train.py → checkpoint → resume → eval.py,
all on the synthetic Blender-format sphere scene."""
import glob
import os

import numpy as np
import pytest

from tests.datasets_synthetic import make_blender_dataset


@pytest.fixture(scope="module")
def scene_root(tmp_path_factory):
    return make_blender_dataset(str(tmp_path_factory.mktemp("scene")), hw=40)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory, scene_root):
    """Run train.py's main for 2 epochs in an isolated cwd."""
    wd = tmp_path_factory.mktemp("train_run")
    cwd = os.getcwd()
    os.chdir(wd)
    try:
        from opt import get_opts
        from train import main
        hparams = get_opts([
            "--root_dir", scene_root,
            "--dataset_name", "blender",
            "--img_wh", "40", "40",
            "--N_samples", "24", "--N_importance", "8",
            "--batch_size", "1024",
            "--num_epochs", "2",
            "--lr", "1e-3",
            "--decay_step", "100",
            "--exp_name", "smoke",
        ])
        state = main(hparams)
    finally:
        os.chdir(cwd)
    return str(wd), state


def test_train_cli_produces_checkpoints_and_logs(workdir):
    wd, state = workdir
    ckpts = sorted(glob.glob(os.path.join(wd, "ckpts", "smoke", "*.msgpack")))
    assert len(ckpts) == 2
    assert int(state.step) > 0
    assert glob.glob(os.path.join(wd, "logs", "smoke", "*"))  # tensorboard events


def test_resume_continues_from_epoch(workdir, scene_root):
    wd, state = workdir
    ckpts = sorted(glob.glob(os.path.join(wd, "ckpts", "smoke", "*.msgpack")))
    cwd = os.getcwd()
    os.chdir(wd)
    try:
        from opt import get_opts
        from train import main
        hparams = get_opts([
            "--root_dir", scene_root,
            "--dataset_name", "blender",
            "--img_wh", "40", "40",
            "--N_samples", "24", "--N_importance", "8",
            "--batch_size", "1024",
            "--num_epochs", "3",
            "--lr", "1e-3",
            "--decay_step", "100",
            "--exp_name", "smoke_resume",
            "--ckpt_path", sorted(ckpts)[-1],
        ])
        state2 = main(hparams)
    finally:
        os.chdir(cwd)
    # resumed at epoch 2, ran 1 more epoch → step advanced past the loaded state
    assert int(state2.step) > int(state.step)


def test_eval_cli_renders(workdir, scene_root):
    wd, _ = workdir
    ckpt = sorted(glob.glob(os.path.join(wd, "ckpts", "smoke", "*.msgpack")))[-1]
    cwd = os.getcwd()
    os.chdir(wd)
    try:
        from eval import get_opts as eval_opts, main as eval_main
        mean_psnr = eval_main(eval_opts([
            "--root_dir", scene_root,
            "--dataset_name", "blender",
            "--split", "test",
            "--img_wh", "40", "40",
            "--N_samples", "24", "--N_importance", "8",
            "--ckpt_path", ckpt,
            "--scene_name", "sphere",
            "--save_depth",
            "--compute_dtype", "float32",
        ]))
        out_dir = os.path.join(wd, "results", "blender", "sphere")
        pngs = glob.glob(os.path.join(out_dir, "*.png"))
        assert len(pngs) == 2
        assert os.path.exists(os.path.join(out_dir, "sphere.gif"))
        assert glob.glob(os.path.join(out_dir, "depth_*.pfm"))
        assert mean_psnr is not None and np.isfinite(mean_psnr)
    finally:
        os.chdir(cwd)


def test_pfm_roundtrip(tmp_path):
    from nerf_siren_tpu.datasets.depth_utils import load_pfm, save_pfm
    depth = np.random.default_rng(0).uniform(0, 10, (30, 40)).astype(np.float32)
    p = str(tmp_path / "d.pfm")
    save_pfm(p, depth)
    loaded, scale = load_pfm(p)
    np.testing.assert_allclose(loaded, depth, rtol=1e-6)


def test_train_cli_semantic_d3(tmp_path_factory):
    """mode=d3 end-to-end: blender_cls_ib dataset + PointNet semantics."""
    from tests.datasets_synthetic import make_blender_cls_dataset
    scene = make_blender_cls_dataset(str(tmp_path_factory.mktemp("scene_cls")), hw=40)
    wd = tmp_path_factory.mktemp("train_run_d3")
    cwd = os.getcwd()
    os.chdir(wd)
    try:
        from opt import get_opts
        from train import main
        hparams = get_opts([
            "--root_dir", scene,
            "--dataset_name", "blender_cls_ib",
            "--mode", "d3",
            "--img_wh", "40", "40",
            "--N_samples", "16", "--N_importance", "0",
            "--batch_size", "512",
            "--num_epochs", "1",
            "--steps_per_dispatch", "3",  # exercises the cls scan path
            "--lr", "1e-3",
            "--decay_step", "100",
            "--loss_type", "msenll",
            "--exp_name", "smoke_d3",
        ])
        state = main(hparams)
        assert int(state.step) > 0
        assert "points" in state.params
    finally:
        os.chdir(cwd)


def test_train_cli_fused_backend(tmp_path_factory, scene_root):
    """--train_backend fused: one tiny epoch through the Pallas training
    kernels (interpret mode on CPU) produces a finite-loss checkpoint."""
    wd = tmp_path_factory.mktemp("train_fused")
    cwd = os.getcwd()
    os.chdir(wd)
    try:
        from opt import get_opts
        from train import main
        state = main(get_opts([
            "--root_dir", scene_root,
            "--dataset_name", "blender",
            "--img_wh", "40", "40",
            "--N_samples", "8", "--N_importance", "8",
            "--batch_size", "256",
            "--num_epochs", "1",
            "--lr", "1e-3",
            "--decay_step", "100",
            "--train_backend", "fused",
            "--exp_name", "smoke_fused",
        ]))
        assert int(state.step) > 0
        ckpts = glob.glob(os.path.join(wd, "ckpts", "smoke_fused", "*.msgpack"))
        assert ckpts
    finally:
        os.chdir(cwd)


def test_extract_color_mesh_cli(workdir, scene_root):
    """Mesh extraction end-to-end from a trained checkpoint."""
    wd, _ = workdir
    ckpt = sorted(glob.glob(os.path.join(wd, "ckpts", "smoke", "*.msgpack")))[-1]
    cwd = os.getcwd()
    os.chdir(wd)
    try:
        from extract_color_mesh import get_opts as mesh_opts, main as mesh_main
        out_path = mesh_main(mesh_opts([
            "--root_dir", scene_root,
            "--dataset_name", "blender",
            "--img_wh", "40", "40",
            "--ckpt_path", ckpt,
            "--N_grid", "48",
            "--x_range", "-1.5", "1.5",
            "--y_range", "-1.5", "1.5",
            "--z_range", "-1.5", "1.5",
            "--sigma_threshold", "0.5",
            "--N_samples", "24",
            "--scene_name", "sphere_mesh",
        ]))
        assert os.path.exists(out_path)
        from nerf_siren_tpu.mesh.ply import read_ply
        v, f, c = read_ply(out_path)
        assert (c is None) == (len(v) == 0)
        if len(v):  # fusion path produced per-vertex colors
            assert len(c) == len(v) and len(f) > 0
    finally:
        os.chdir(cwd)


def test_train_cli_eg3d(tmp_path_factory, scene_root):
    """mode=eg3d end-to-end at a tiny triplane config."""
    wd = tmp_path_factory.mktemp("train_run_eg3d")
    cwd = os.getcwd()
    os.chdir(wd)
    try:
        from opt import get_opts
        from train import main
        hparams = get_opts([
            "--root_dir", scene_root,
            "--dataset_name", "blender",
            "--mode", "eg3d",
            "--img_wh", "40", "40",
            "--N_samples", "12", "--N_importance", "8",
            "--batch_size", "800",
            "--num_epochs", "1",
            "--lr", "1e-2",
            "--decay_step", "100",
            "--exp_name", "smoke_eg3d",
            "--eg3d_plane_res", "16",
            "--eg3d_channel_base", "512",
            "--eg3d_channel_max", "32",
            "--eg3d_z_dim", "32",
            "--eg3d_ray_start", "2.0",
            "--eg3d_ray_end", "6.0",
            "--eg3d_box_warp", "8.0",
        ])
        state = main(hparams)
        assert int(state.step) > 0
        assert "eg3d_renderer" in state.params
        ckpts = glob.glob(os.path.join(wd, "ckpts", "smoke_eg3d", "*.msgpack"))
        assert ckpts
    finally:
        os.chdir(cwd)


def test_eval_cli_exact_multichip(workdir, scene_root):
    """--renderer exact --num_chips 0: frame rays shard over the virtual
    8-device mesh; output must stay a finite full-frame PSNR + PNGs."""
    wd, _ = workdir
    ckpt = sorted(glob.glob(os.path.join(wd, "ckpts", "smoke", "*.msgpack")))[-1]
    cwd = os.getcwd()
    os.chdir(wd)
    try:
        from eval import get_opts as eval_opts, main as eval_main
        mean_psnr = eval_main(eval_opts([
            "--root_dir", scene_root,
            "--dataset_name", "blender",
            "--split", "test",
            "--img_wh", "40", "40",
            "--N_samples", "24", "--N_importance", "8",
            "--ckpt_path", ckpt,
            "--scene_name", "sphere_multichip",
            "--renderer", "exact",
            "--num_chips", "0",
            "--chunk", "256",
            "--compute_dtype", "float32",
        ]))
        assert mean_psnr is not None and np.isfinite(mean_psnr)
        pngs = glob.glob(os.path.join(wd, "results", "blender",
                                      "sphere_multichip", "*.png"))
        assert len(pngs) == 2
    finally:
        os.chdir(cwd)


def test_eval_cli_fast_renderer(workdir, scene_root):
    """--renderer fast: distill proxy from checkpoint, AABB-culled render."""
    wd, _ = workdir
    ckpt = sorted(glob.glob(os.path.join(wd, "ckpts", "smoke", "*.msgpack")))[-1]
    cwd = os.getcwd()
    os.chdir(wd)
    try:
        from eval import get_opts as eval_opts, main as eval_main
        mean_psnr = eval_main(eval_opts([
            "--root_dir", scene_root,
            "--dataset_name", "blender",
            "--split", "test",
            "--img_wh", "40", "40",
            "--N_samples", "24", "--N_importance", "8",
            "--ckpt_path", ckpt,
            "--scene_name", "sphere_fast",
            "--renderer", "fast",
            "--fast_candidates", "24", "--fast_keep", "8",
            "--fast_distill_steps", "20", "--fast_distill_batch", "2048",
            "--compute_dtype", "float32",
        ]))
        assert mean_psnr is not None and np.isfinite(mean_psnr)
        pngs = glob.glob(os.path.join(wd, "results", "blender", "sphere_fast", "*.png"))
        assert len(pngs) == 2
    finally:
        os.chdir(cwd)


def test_eval_cli_fast_int8(workdir, scene_root):
    """--fast_field_dtype int8: survivor eval through the int8-trunk kernel
    (AABB-calibrated activation scales); full-frame PSNR stays finite."""
    wd, _ = workdir
    ckpt = sorted(glob.glob(os.path.join(wd, "ckpts", "smoke", "*.msgpack")))[-1]
    cwd = os.getcwd()
    os.chdir(wd)
    try:
        from eval import get_opts as eval_opts, main as eval_main
        mean_psnr = eval_main(eval_opts([
            "--root_dir", scene_root,
            "--dataset_name", "blender",
            "--split", "test",
            "--img_wh", "40", "40",
            "--N_samples", "24", "--N_importance", "8",
            "--ckpt_path", ckpt,
            "--scene_name", "sphere_fast_i8",
            "--renderer", "fast",
            "--fast_candidates", "24", "--fast_keep", "8",
            "--fast_distill_steps", "20", "--fast_distill_batch", "2048",
            "--fast_field_dtype", "int8",
            "--compute_dtype", "float32",
        ]))
        assert mean_psnr is not None and np.isfinite(mean_psnr)
        pngs = glob.glob(os.path.join(wd, "results", "blender",
                                      "sphere_fast_i8", "*.png"))
        assert len(pngs) == 2
    finally:
        os.chdir(cwd)


def test_eval_cli_fused_int8(workdir, scene_root):
    """--renderer fused --fast_field_dtype int8: quantized FULL-frame eval
    (every stratified sample, not just proxy survivors). Activation scales
    are dynamic per point, computed in-kernel — the r4 redesign removed
    calibration entirely (static per-tensor scales measured unusable on
    trained trunks, docs/int8_quality.json)."""
    wd, _ = workdir
    ckpt = sorted(glob.glob(os.path.join(wd, "ckpts", "smoke", "*.msgpack")))[-1]
    cwd = os.getcwd()
    os.chdir(wd)
    try:
        from eval import get_opts as eval_opts, main as eval_main
        mean_psnr = eval_main(eval_opts([
            "--root_dir", scene_root,
            "--dataset_name", "blender",
            "--split", "test",
            "--img_wh", "40", "40",
            "--N_samples", "24", "--N_importance", "8",
            "--ckpt_path", ckpt,
            "--scene_name", "sphere_fused_i8",
            "--renderer", "fused",
            "--fast_field_dtype", "int8",
            "--compute_dtype", "float32",
        ]))
        assert mean_psnr is not None and np.isfinite(mean_psnr)
        pngs = glob.glob(os.path.join(wd, "results", "blender",
                                      "sphere_fused_i8", "*.png"))
        assert len(pngs) == 2
    finally:
        os.chdir(cwd)


def test_eval_cli_fast_auto_cull(workdir, scene_root):
    """--fast_cull auto: frame-global empty-ray culling on the fused path.

    The auto renderer partitions each frame's rays by proxy AABB hit length,
    renders the non-empty partition through the fused kernel, and reassembles
    — output must stay a finite full-frame PSNR with the usual PNGs."""
    wd, _ = workdir
    ckpt = sorted(glob.glob(os.path.join(wd, "ckpts", "smoke", "*.msgpack")))[-1]
    cwd = os.getcwd()
    os.chdir(wd)
    try:
        from eval import get_opts as eval_opts, main as eval_main
        mean_psnr = eval_main(eval_opts([
            "--root_dir", scene_root,
            "--dataset_name", "blender",
            "--split", "test",
            "--img_wh", "40", "40",
            "--N_samples", "24", "--N_importance", "8",
            "--ckpt_path", ckpt,
            "--scene_name", "sphere_autocull",
            "--renderer", "fast",
            "--fast_candidates", "24", "--fast_keep", "8",
            "--fast_distill_steps", "20", "--fast_distill_batch", "2048",
            "--fast_cull", "auto",
            "--compute_dtype", "float32",
        ]))
        assert mean_psnr is not None and np.isfinite(mean_psnr)
        pngs = glob.glob(os.path.join(wd, "results", "blender", "sphere_autocull", "*.png"))
        assert len(pngs) == 2
    finally:
        os.chdir(cwd)


def test_eval_cli_fast_edge_refine(workdir, scene_root):
    """--fast_edge_refine: the fast frame's silhouette band re-renders
    through the exact-lite fused pass (round-5 parity close,
    docs/fast_gap_diagnosis.json); output stays a finite full-frame PSNR
    with the usual PNGs."""
    wd, _ = workdir
    ckpt = sorted(glob.glob(os.path.join(wd, "ckpts", "smoke", "*.msgpack")))[-1]
    cwd = os.getcwd()
    os.chdir(wd)
    try:
        from eval import get_opts as eval_opts, main as eval_main
        mean_psnr = eval_main(eval_opts([
            "--root_dir", scene_root,
            "--dataset_name", "blender",
            "--split", "test",
            "--img_wh", "40", "40",
            "--N_samples", "24", "--N_importance", "8",
            "--ckpt_path", ckpt,
            "--scene_name", "sphere_edge",
            "--renderer", "fast",
            "--fast_candidates", "24", "--fast_keep", "8",
            "--fast_distill_steps", "20", "--fast_distill_batch", "2048",
            "--fast_edge_refine", "0.05",
            "--fast_edge_lite", "16", "8",
            "--compute_dtype", "float32",
        ]))
        assert mean_psnr is not None and np.isfinite(mean_psnr)
        pngs = glob.glob(os.path.join(wd, "results", "blender",
                                      "sphere_edge", "*.png"))
        assert len(pngs) == 2
    finally:
        os.chdir(cwd)


def test_eval_cli_llff_spiral_no_gt(tmp_path_factory):
    """LLFF test split renders a spiral path with no ground truth: eval
    must write frames and return None for PSNR."""
    from tests.datasets_synthetic import make_llff_dataset
    scene = make_llff_dataset(str(tmp_path_factory.mktemp("llff_eval")))
    wd = tmp_path_factory.mktemp("eval_llff")
    cwd = os.getcwd()
    os.chdir(wd)
    try:
        import jax
        from nerf_siren_tpu.models.nerf import init_nerf
        from nerf_siren_tpu.training.checkpoints import save_checkpoint
        ckpt = str(wd / "w.msgpack")
        save_checkpoint(ckpt, {"nerf_coarse": init_nerf(jax.random.PRNGKey(0))})

        from eval import get_opts as eval_opts, main as eval_main
        mean_psnr = eval_main(eval_opts([
            "--root_dir", scene,
            "--dataset_name", "llff",
            "--split", "test",
            "--img_wh", "40", "30",
            "--N_samples", "16", "--N_importance", "0",
            "--ckpt_path", ckpt,
            "--scene_name", "fern_like",
            "--compute_dtype", "float32",
        ]))
        assert mean_psnr is None  # spiral path has no GT
        pngs = glob.glob(os.path.join(wd, "results", "llff", "fern_like", "*.png"))
        assert len(pngs) == 120  # default spiral poses
    finally:
        os.chdir(cwd)


def test_eval_and_mesh_eg3d_cli(tmp_path_factory, scene_root):
    """eval_eg3d.py and extract_color_mesh_eg3d.py on a tiny trained ckpt."""
    wd = tmp_path_factory.mktemp("eg3d_tools")
    cwd = os.getcwd()
    os.chdir(wd)
    tiny = ["--eg3d_plane_res", "16", "--eg3d_channel_base", "512",
            "--eg3d_channel_max", "32", "--eg3d_z_dim", "32"]
    try:
        from opt import get_opts
        from train import main
        state = main(get_opts([
            "--root_dir", scene_root, "--dataset_name", "blender",
            "--mode", "eg3d", "--img_wh", "40", "40",
            "--N_samples", "12", "--N_importance", "8",
            "--batch_size", "800", "--num_epochs", "1",
            "--steps_per_dispatch", "4",   # exercises train_scan_batches
            "--lr", "1e-2", "--decay_step", "100",
            "--exp_name", "eg3d_tools",
            "--eg3d_ray_start", "2.0", "--eg3d_ray_end", "6.0",
            "--eg3d_box_warp", "8.0"] + tiny))
        ckpt = sorted(glob.glob(os.path.join(wd, "ckpts", "eg3d_tools",
                                             "*.msgpack")))[-1]

        from eval_eg3d import get_opts as eopts, main as emain
        mean_psnr = emain(eopts([
            "--root_dir", scene_root, "--dataset_name", "blender",
            "--split", "test", "--img_wh", "40", "40",
            "--ckpt_path", ckpt, "--scene_name", "eg3d_eval",
            "--N_samples", "12", "--N_importance", "8",
            "--eg3d_ray_start", "2.0", "--eg3d_ray_end", "6.0",
            "--eg3d_box_warp", "8.0", "--chunk", "800",
            "--num_chips", "0"] + tiny))  # sharded over the virtual mesh
        assert mean_psnr is not None and np.isfinite(mean_psnr)
        assert glob.glob(os.path.join(wd, "results", "blender", "eg3d_eval", "*.png"))

        # fast renderer over the same checkpoint (proxy-culled K samples);
        # 40x40=1600 rays pad to one 2048-lane march tile
        mean_psnr_fast = emain(eopts([
            "--root_dir", scene_root, "--dataset_name", "blender",
            "--split", "test", "--img_wh", "40", "40",
            "--ckpt_path", ckpt, "--scene_name", "eg3d_eval_fast",
            "--N_samples", "12", "--N_importance", "8",
            "--eg3d_ray_start", "2.0", "--eg3d_ray_end", "6.0",
            "--eg3d_box_warp", "8.0",
            "--renderer", "fast", "--fast_candidates", "16",
            "--fast_keep", "8", "--fast_distill_steps", "20",
            "--fast_distill_batch", "2048", "--fast_cull", "auto"] + tiny))
        assert mean_psnr_fast is not None and np.isfinite(mean_psnr_fast)
        assert glob.glob(os.path.join(wd, "results", "blender",
                                      "eg3d_eval_fast", "*.png"))

        from extract_color_mesh_eg3d import get_opts as mopts, main as mmain
        out = mmain(mopts([
            "--ckpt_path", ckpt, "--N_grid", "32",
            "--cube_length", "4.0", "--sigma_threshold", "0.5",
            "--scene_name", "eg3d_mesh", "--colorize",
            "--eg3d_box_warp", "8.0"] + tiny))
        assert os.path.exists(out)
    finally:
        os.chdir(cwd)


def test_example_render_single_image(workdir, scene_root):
    """examples/render_single_image.py (the test.ipynb flow, headless)."""
    import subprocess, sys
    wd, _ = workdir
    ckpt = sorted(glob.glob(os.path.join(wd, "ckpts", "smoke", "*.msgpack")))[-1]
    out_dir = os.path.join(wd, "single_out")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "render_single_image.py"),
         "--root_dir", scene_root, "--ckpt_path", ckpt,
         "--img_wh", "40", "40", "--N_samples", "24", "--N_importance", "8",
         "--out_dir", out_dir],
        capture_output=True, text=True, timeout=900, cwd=repo)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "PSNR" in r.stdout and "render time" in r.stdout
    assert os.path.exists(os.path.join(out_dir, "rgb.png"))
    assert os.path.exists(os.path.join(out_dir, "depth.png"))


def test_eval_cli_semantic_d3(tmp_path_factory, capfd):
    """--mode d3 end-to-end: train a semantic checkpoint on the synthetic
    cls fixture, then evaluate it post-hoc — class-map PNGs (reference
    r_<i>.png, class id x 10), color_cls overlays, and pixel acc + mIoU
    (reference eval.py:122-174)."""
    from tests.datasets_synthetic import make_blender_cls_dataset
    scene = make_blender_cls_dataset(
        str(tmp_path_factory.mktemp("scene_cls_eval")), hw=40)
    wd = tmp_path_factory.mktemp("eval_run_d3")
    cwd = os.getcwd()
    os.chdir(wd)
    try:
        from opt import get_opts
        from train import main
        main(get_opts([
            "--root_dir", scene,
            "--dataset_name", "blender_cls_ib",
            "--mode", "d3",
            "--img_wh", "40", "40",
            "--N_samples", "16", "--N_importance", "0",
            "--batch_size", "512",
            "--num_epochs", "1",
            "--lr", "1e-3",
            "--decay_step", "100",
            "--loss_type", "msenll",
            "--exp_name", "eval_d3",
        ]))
        ckpt = sorted(glob.glob(
            os.path.join(wd, "ckpts", "eval_d3", "*.msgpack")))[-1]
        from eval import get_opts as eval_opts, main as eval_main
        eval_main(eval_opts([
            "--root_dir", scene,
            "--dataset_name", "blender_cls_ib",
            "--split", "test",
            "--img_wh", "40", "40",
            "--N_samples", "16", "--N_importance", "0",
            "--ckpt_path", ckpt,
            "--scene_name", "sem",
            "--mode", "d3",
            "--semantic_network", "pointnet",
            "--point_capacity", "2048",
            "--compute_dtype", "float32",
        ]))
        out = capfd.readouterr().out
        assert "Mean class accuracy" in out and "mIoU" in out
        # class count must come from the checkpoint head, not a CLI guess —
        # train.py sized it from the dataset; a mismatched guess would
        # silently evaluate a random-init classifier (non-strict load skips
        # shape-mismatched leaves)
        assert "n_classes" in out and "checkpoint head" in out
        res = os.path.join(wd, "results", "blender_cls_ib")
        cls_maps = glob.glob(os.path.join(res, "sem", "r_*.png"))
        assert cls_maps, "reference-format class maps missing"
        overlays = glob.glob(os.path.join(res, "sem_cls_map", "*"))
        assert overlays, "color_cls overlays missing"

        # --renderer fast (round 4, VERDICT r3 item 9): the cls head rides
        # the fast path's survivor samples (semantic_from_weights over
        # z/w/rgb_samples) instead of falling back to the exact path
        eval_main(eval_opts([
            "--root_dir", scene,
            "--dataset_name", "blender_cls_ib",
            "--split", "test",
            "--img_wh", "40", "40",
            "--N_samples", "16", "--N_importance", "0",
            "--ckpt_path", ckpt,
            "--scene_name", "sem_fast",
            "--mode", "d3",
            "--renderer", "fast",
            "--fast_candidates", "16", "--fast_keep", "8",
            "--fast_distill_steps", "20", "--fast_distill_batch", "2048",
            "--semantic_network", "pointnet",
            "--point_capacity", "2048",
            "--compute_dtype", "float32",
            "--cls_threshold", "0.0",
        ]))
        out_fast = capfd.readouterr().out
        assert "Mean class accuracy" in out_fast and "mIoU" in out_fast
        assert "ignoring --renderer" not in out_fast
        assert glob.glob(os.path.join(res, "sem_fast", "r_*.png")), \
            "fast-path class maps missing"

        # an explicit count that contradicts the checkpoint must FAIL, not
        # silently evaluate random weights
        import pytest
        with pytest.raises(SystemExit, match="classifier head"):
            eval_main(eval_opts([
                "--root_dir", scene,
                "--dataset_name", "blender_cls_ib",
                "--split", "test",
                "--img_wh", "40", "40",
                "--N_samples", "16", "--N_importance", "0",
                "--ckpt_path", ckpt,
                "--scene_name", "sem_bad",
                "--mode", "d3",
                "--semantic_network", "pointnet",
                "--point_capacity", "2048",
                "--n_classes", "17",
            ]))
    finally:
        os.chdir(cwd)


def test_eval_cli_fast_proxy_cache(workdir, scene_root, capfd):
    """Second --renderer fast invocation must REUSE the persisted proxy
    (skip distillation) and invalidate when the distill config changes."""
    wd, _ = workdir
    ckpt = sorted(glob.glob(os.path.join(wd, "ckpts", "smoke", "*.msgpack")))[-1]
    # explicit cache location: other fast-renderer tests share this module's
    # ckpt and would pre-populate the default <ckpt>.proxy.msgpack cache,
    # making the first invocation here a reuse instead of a save
    proxy_cache = os.path.join(wd, "proxycache_test.msgpack")
    cwd = os.getcwd()
    os.chdir(wd)
    try:
        from eval import get_opts as eval_opts, main as eval_main
        args = [
            "--root_dir", scene_root,
            "--dataset_name", "blender",
            "--split", "test",
            "--img_wh", "40", "40",
            "--N_samples", "24", "--N_importance", "8",
            "--ckpt_path", ckpt,
            "--scene_name", "sphere_proxycache",
            "--renderer", "fast",
            "--fast_candidates", "24", "--fast_keep", "8",
            "--fast_distill_steps", "20", "--fast_distill_batch", "2048",
            "--fast_proxy_path", proxy_cache,
            "--compute_dtype", "float32",
        ]
        p1 = eval_main(eval_opts(args))
        assert os.path.exists(proxy_cache)
        out1 = capfd.readouterr().out
        assert "saved distilled proxy" in out1
        p2 = eval_main(eval_opts(args))
        out2 = capfd.readouterr().out
        assert "reusing distilled proxy" in out2
        assert "distilling density proxy" not in out2
        assert abs(p1 - p2) < 1e-4  # same proxy -> same render
        # changed distill config invalidates the cache
        args2 = list(args)
        args2[args2.index("--fast_distill_steps") + 1] = "21"
        eval_main(eval_opts(args2))
        out3 = capfd.readouterr().out
        assert "re-distilling" in out3
    finally:
        os.chdir(cwd)


def test_train_culled_backend_eval_reuses_online_proxy(workdir, scene_root,
                                                       capfd):
    """--train_backend culled: the online placement proxy trains jointly and
    lands in the checkpoint under the 'proxy' prefix; a later
    eval --renderer fast must reuse it and skip distillation entirely."""
    wd, _ = workdir
    cwd = os.getcwd()
    os.chdir(wd)
    try:
        from opt import get_opts
        from train import main
        hparams = get_opts([
            "--root_dir", scene_root,
            "--dataset_name", "blender",
            "--img_wh", "40", "40",
            "--N_samples", "24", "--N_importance", "8",
            "--batch_size", "1024",
            "--num_epochs", "1",
            "--lr", "1e-3",
            "--decay_step", "100",
            "--exp_name", "smoke_culled",
            "--train_backend", "culled",
        ])
        state = main(hparams)
        assert "proxy" in state.params
        ckpt = sorted(glob.glob(
            os.path.join(wd, "ckpts", "smoke_culled", "*.msgpack")))[-1]
        capfd.readouterr()
        from eval import get_opts as eval_opts, main as eval_main
        mean_psnr = eval_main(eval_opts([
            "--root_dir", scene_root,
            "--dataset_name", "blender",
            "--split", "test",
            "--img_wh", "40", "40",
            "--N_samples", "24", "--N_importance", "8",
            "--ckpt_path", ckpt,
            "--scene_name", "sphere_culled",
            "--renderer", "fast",
            "--fast_candidates", "24", "--fast_keep", "8",
            "--compute_dtype", "float32",
        ]))
        out = capfd.readouterr().out
        assert "reusing the online culled-training proxy" in out
        assert "distilling density proxy" not in out
        assert mean_psnr is not None and np.isfinite(mean_psnr)
    finally:
        os.chdir(cwd)


def test_reference_mixed_precision_flag_alias():
    """The reference's --is_use_mixed_precision (opt.py:86) must be accepted
    verbatim and map to bf16 MXU operands (the TPU autocast analogue)."""
    from opt import get_opts
    base = ["--root_dir", "/x", "--dataset_name", "blender"]
    assert get_opts(base).compute_dtype == "float32"
    assert get_opts(base + ["--is_use_mixed_precision"]).compute_dtype \
        == "bfloat16"
    assert get_opts(base + ["--is_use_mixed_precision", "True"]) \
        .compute_dtype == "bfloat16"
    # deliberate divergence from the reference's type=bool quirk (where
    # 'False' still enabled it): an explicit falsy value turns it off
    assert get_opts(base + ["--is_use_mixed_precision", "False"]) \
        .compute_dtype == "float32"
