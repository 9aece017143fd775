"""Training stack: dataset loading/slicing, metrics, end-to-end training
smoke (loss decreases), checkpoint resume, compact export task."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rt_octree_tpu.train import metrics as M
from rt_octree_tpu.train.config import parse_args
from rt_octree_tpu.train.dataset import (
    BlenderDataset, DatasetConfig, preprocess, slice_imgs, valid_chunk)
from rt_octree_tpu.train.logger import BaseLogger
from rt_octree_tpu.train.runner import Runner, find_latest_checkpoint


# ---------------------------------------------------------------------------
# synthetic micro-dataset fixture (blender layout)
# ---------------------------------------------------------------------------

H = W = 32


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    import imageio.v2 as imageio
    root = tmp_path_factory.mktemp("blender_lego")
    rng = np.random.default_rng(0)
    for split, n in [("train", 3), ("test", 2)]:
        os.makedirs(root / split, exist_ok=True)
        os.makedirs(root / "spp_6" / split, exist_ok=True)
        frames = []
        for i in range(n):
            name = f"r_{i}"
            frames.append({"file_path": f"./{split}/{name}",
                           "transform_matrix": np.eye(4).tolist()})
            clean = rng.random((H, W, 4)).astype(np.float32)
            clean[..., 3] = (rng.random((H, W)) > 0.3).astype(np.float32)
            noisy_rgb = np.clip(
                clean[..., :3] + 0.1 * rng.standard_normal((H, W, 3)), 0, 1)
            alpha = clean[..., 3]
            aux = np.concatenate([
                noisy_rgb.transpose(2, 0, 1), alpha[None],
                (noisy_rgb ** 2).transpose(2, 0, 1), (alpha ** 2)[None],
            ]).astype(np.float32)
            aux.tofile(root / "spp_6" / split / f"buf_{name}.bin")
            imageio.imwrite(root / split / f"{name}.png",
                            (clean * 255).astype(np.uint8))
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.69, "frames": frames}, f)
    return str(root)


def make_args(data_dir, work_dir, **over):
    argv = ["--task", over.pop("task", "train"),
            "--data_dir", data_dir,
            "--logs_root", work_dir, "--exp_name", "t",
            "--dataset_type", "blender", "--spp", "6",
            "--nx", "2", "--ny", "2",
            "--mid_channels", "8", "--num_layers", "2",
            "--num_branches", "2", "--kernel_levels", "2",
            "--in_channels", "8",
            "--lr", "0.003", "--epochs", over.pop("epochs", "4"),
            "--batch_size", "4", "--i_save", "2", "--i_test", "100"]
    for k, v in over.items():
        argv += [f"--{k}", str(v)]
    return parse_args(argv)


# ---------------------------------------------------------------------------


def test_dataset_loading_and_slicing(data_dir):
    cfg = DatasetConfig(data_dir=data_dir, dataset_type="blender", spp=6,
                        nx=2, ny=2)
    ds = BlenderDataset(cfg)
    assert "train" in ds.splits and "test" in ds.splits
    # train sliced into 16x16 chunks, test kept whole
    a0 = ds.splits["train"].aux[0]
    assert a0.shape == (8, 16, 16)
    assert ds.splits["test"].aux[0].shape == (8, H, W)
    assert ds.splits["test"].img_in[0].shape == (H, W, 4)
    # batches
    b = next(ds.iter_batches("train", 4, shuffle=True, seed=1))
    assert b[0].shape == (4, 8, 16, 16)


def test_preprocess_white_background():
    aux = np.zeros((8, 4, 4), np.float32)
    gt = np.zeros((4, 4, 4), np.uint8)
    gt[..., 3] = 0  # fully transparent -> white
    _, _, out = preprocess(aux, gt)
    np.testing.assert_allclose(out[..., :3], 1.0)


def test_valid_chunk_filter():
    gt = np.zeros((8, 8, 4), np.float32)
    assert not valid_chunk(gt, has_alpha=True)  # all empty
    gt[..., 3] = 1.0
    assert valid_chunk(gt, has_alpha=True)


def test_ssim_sanity(np_rng):
    a = jnp.asarray(np_rng.random((1, 32, 32, 3)), jnp.float32)
    assert float(M.ssim(a, a)) == pytest.approx(1.0, abs=1e-5)
    b = jnp.clip(a + 0.5, 0, 1)
    assert float(M.ssim(a, b)) < 0.9


def test_psnr():
    a = jnp.zeros((1, 8, 8, 3))
    b = jnp.full((1, 8, 8, 3), 0.1)
    assert M.psnr(a, b) == pytest.approx(20.0, abs=1e-3)


def test_smape():
    a = jnp.asarray([1.0])
    b = jnp.asarray([3.0])
    assert float(M.smape_loss(a, b)) == pytest.approx(2.0 / (4.0 + 1e-5))


def test_lpips_unavailable_without_weights():
    m = M.LPIPSMetric(weights_path="")
    assert not m.available()


def test_train_loss_decreases_and_artifacts(data_dir, tmp_path):
    args = make_args(data_dir, str(tmp_path), epochs="6")
    cfg = DatasetConfig(data_dir=data_dir, dataset_type="blender", spp=6,
                        nx=2, ny=2)
    ds = BlenderDataset(cfg)
    runner = Runner(args, dataset=ds, logger=BaseLogger(args))
    runner.train()

    log_path = os.path.join(args.work_dir, "log.jsonl")
    losses = []
    with open(log_path) as f:
        for line in f:
            d = json.loads(line)
            if "train/loss" in d:
                losses.append(d["train/loss"])
    assert len(losses) >= 6
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    # artifacts: checkpoints + compact exports + final test metrics
    assert find_latest_checkpoint(args.work_dir) is not None
    assert os.path.exists(os.path.join(args.work_dir, "ts_000002.gnet"))
    with open(log_path) as f:
        final = json.loads(f.readlines()[-1])
    assert "test/psnr" in final and final["test/psnr"] > 5


def test_checkpoint_resume(data_dir, tmp_path):
    args = make_args(data_dir, str(tmp_path), epochs="2")
    cfg = DatasetConfig(data_dir=data_dir, dataset_type="blender", spp=6,
                        nx=2, ny=2)
    ds = BlenderDataset(cfg)
    r1 = Runner(args, dataset=ds, logger=BaseLogger(args))
    r1.train()
    ck = find_latest_checkpoint(args.work_dir)
    assert ck and "000002" in ck

    # resuming with more epochs starts from epoch 3
    args2 = make_args(data_dir, str(tmp_path), epochs="3")
    r2 = Runner(args2, dataset=ds, logger=BaseLogger(args2))
    r2.train()
    with open(os.path.join(args2.work_dir, "log.jsonl")) as f:
        epochs = [json.loads(x).get("epoch") for x in f]
    assert 3 in epochs


def test_compact_task(data_dir, tmp_path):
    from rt_octree_tpu.models.guidance_net import load_compact
    args = make_args(data_dir, str(tmp_path), task="compact")
    runner = Runner(args, logger=BaseLogger(args))
    runner.compact(load_ckpt=True)  # no checkpoint -> fresh params
    path = os.path.join(args.work_dir, "ts_latest.gnet")
    assert os.path.exists(path)
    cfg, params = load_compact(path)
    assert cfg.kernel_levels == 2


def test_config_file_parsing(tmp_path):
    cfg_file = tmp_path / "c.txt"
    cfg_file.write_text(
        "task = train\nexp_name = foo\nlr = 0.01\nnx = 7\n"
        "save_image = true\n")
    args = parse_args(["--config", str(cfg_file), "--logs_root",
                       str(tmp_path)])
    assert args.task == "train" and args.exp_name == "foo"
    assert args.lr == 0.01 and args.nx == 7 and args.save_image is True
    # CLI overrides file
    args = parse_args(["--config", str(cfg_file), "--lr", "0.5",
                       "--logs_root", str(tmp_path)])
    assert args.lr == 0.5
