"""Synthetic dataset fixtures: a ray-traced sphere scene written to disk in
Blender-JSON and LLFF formats, so the real loaders can be exercised end-to-end
without shipping datasets (SURVEY §4: golden values from closed-form fields).
"""
from __future__ import annotations

import json
import os

import numpy as np
from PIL import Image


def _look_at(eye, target=np.zeros(3), up=np.array([0.0, 0.0, 1.0])):
    """OpenGL-style c2w (camera looks down -z), right-handed."""
    z = eye - target
    z = z / np.linalg.norm(z)
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z, eye], 1)  # (3, 4)


def render_sphere_image(c2w, h, w, focal, radius=1.0, color=(1.0, 0.2, 0.2)):
    """Analytic ray-traced Lambertian sphere at origin; returns RGBA uint8."""
    j, i = np.meshgrid(np.arange(h, dtype=np.float32),
                       np.arange(w, dtype=np.float32), indexing="ij")
    dirs = np.stack([(i - w / 2) / focal, -(j - h / 2) / focal, -np.ones_like(i)], -1)
    dirs = dirs @ c2w[:, :3].T
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    o = c2w[:, 3]

    b = 2 * np.sum(dirs * o, -1)
    c = np.sum(o * o) - radius ** 2
    disc = b ** 2 - 4 * c
    hit = disc > 0
    t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0))) / 2, 0.0)
    pts = o + dirs * t[..., None]
    normal = pts / radius
    light = np.array([0.5, 0.5, 0.8])
    light = light / np.linalg.norm(light)
    lam = np.clip(np.sum(normal * light, -1), 0.1, 1.0)
    rgb = np.where(hit[..., None], np.asarray(color) * lam[..., None], 1.0)
    alpha = hit.astype(np.float32)
    rgba = np.concatenate([rgb, alpha[..., None]], -1)
    return (np.clip(rgba, 0, 1) * 255).astype(np.uint8)


def make_blender_dataset(root, n_train=6, n_val=2, hw=40, cam_dist=4.0):
    """Write transforms_{train,val,test}.json + PNGs for a sphere scene."""
    for d in ("train", "val", "test"):
        os.makedirs(os.path.join(root, d), exist_ok=True)
    camera_angle_x = 0.6911112070083618  # lego's fov
    focal800 = 0.5 * 800 / np.tan(0.5 * camera_angle_x)
    focal = focal800 * hw / 800

    def write_split(split, n, phase):
        frames = []
        for k in range(n):
            theta = 2 * np.pi * k / n + phase
            eye = cam_dist * np.array([np.cos(theta), np.sin(theta), 0.5])
            c2w = _look_at(eye)
            img = render_sphere_image(c2w, hw, hw, focal)
            name = f"{split}/r_{k}"
            Image.fromarray(img).save(os.path.join(root, f"{name}.png"))
            mat = np.concatenate([c2w, [[0, 0, 0, 1.0]]], 0)
            frames.append({"file_path": f"./{name}",
                           "transform_matrix": mat.tolist()})
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": camera_angle_x, "frames": frames}, f)

    write_split("train", n_train, 0.0)
    write_split("val", n_val, 0.3)
    write_split("test", n_val, 0.6)
    return root


def make_llff_dataset(root, n_imgs=5, hw=(40, 30), cam_dist=4.0):
    """Write poses_bounds.npy + images/ for a forward-facing sphere capture."""
    h, w = hw[1], hw[0]
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    focal = 1.2 * w
    poses_bounds = []
    for k in range(n_imgs):
        off = 0.4 * (k - n_imgs // 2) / max(1, n_imgs // 2)
        eye = np.array([off, 0.2 * off, cam_dist])
        c2w = _look_at(eye, up=np.array([0.0, 1.0, 0.0]))
        img = render_sphere_image(c2w, h, w, focal)
        Image.fromarray(img[..., :3]).save(os.path.join(root, "images", f"img_{k:03d}.png"))
        # LLFF stores "down right back" axes: [-y, x, z] columns of our
        # "right up back" pose
        x, y, z, t = c2w[:, 0], c2w[:, 1], c2w[:, 2], c2w[:, 3]
        pose_drb = np.stack([-y, x, z, t], 1)  # (3, 4)
        hwf = np.array([[h], [w], [focal]], np.float32)
        mat = np.concatenate([pose_drb, hwf], 1)  # (3, 5)
        near = cam_dist - 1.5
        far = cam_dist + 1.5
        poses_bounds.append(np.concatenate([mat.flatten(), [near, far]]))
    np.save(os.path.join(root, "poses_bounds.npy"), np.stack(poses_bounds))
    return root


def sphere_class_map(c2w, h, w, focal, radius=1.0):
    """Analytic class map: 0 background, 1 x<0 hemisphere, 2 x>0 (both
    hemispheres visible from any orbit camera, unlike a z split)."""
    j, i = np.meshgrid(np.arange(h, dtype=np.float32),
                       np.arange(w, dtype=np.float32), indexing="ij")
    dirs = np.stack([(i - w / 2) / focal, -(j - h / 2) / focal, -np.ones_like(i)], -1)
    dirs = dirs @ c2w[:, :3].T
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    o = c2w[:, 3]
    b = 2 * np.sum(dirs * o, -1)
    c = np.sum(o * o) - radius ** 2
    disc = b ** 2 - 4 * c
    hit = disc > 0
    t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0))) / 2, 0.0)
    pts = o + dirs * t[..., None]
    return np.where(hit, np.where(pts[..., 0] > 0, 2, 1), 0).astype(np.uint8)


def make_blender_cls_dataset(root, n_train=4, hw=40, cam_dist=4.0):
    """Blender scene + labels/ dir (class-id x 10 PNGs, reference format)."""
    make_blender_dataset(root, n_train=n_train, n_val=2, hw=hw, cam_dist=cam_dist)
    os.makedirs(os.path.join(root, "labels"), exist_ok=True)
    camera_angle_x = 0.6911112070083618
    focal = 0.5 * 800 / np.tan(0.5 * camera_angle_x) * hw / 800
    for split, n, phase in (("train", n_train, 0.0), ("val", 2, 0.3), ("test", 2, 0.6)):
        for k in range(n):
            theta = 2 * np.pi * k / n + phase
            eye = cam_dist * np.array([np.cos(theta), np.sin(theta), 0.5])
            c2w = _look_at(eye)
            cls = sphere_class_map(c2w, hw, hw, focal)
            Image.fromarray((cls * 10).astype(np.uint8)).save(
                os.path.join(root, "labels", f"r_{k}.png"))
    return root


def make_llff_cls_dataset(root, hw=(40, 30), cam_dist=4.0):
    """LLFF scene + edit_parse/raw_parse labels for the edited-ids frames.

    Image names img_{id:03d} with ids drawn from the reference's edited set.
    """
    ids = [25, 50, 75, 100, 125]
    h, w = hw[1], hw[0]
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "edit_parse"), exist_ok=True)
    os.makedirs(os.path.join(root, "raw_parse"), exist_ok=True)
    focal = 1.2 * w
    poses_bounds = []
    for k, fid in enumerate(ids):
        off = 0.4 * (k - len(ids) // 2) / max(1, len(ids) // 2)
        eye = np.array([off, 0.2 * off, cam_dist])
        c2w = _look_at(eye, up=np.array([0.0, 1.0, 0.0]))
        img = render_sphere_image(c2w, h, w, focal)
        name = f"img_{fid}"
        Image.fromarray(img[..., :3]).save(os.path.join(root, "images", f"{name}.png"))
        cls = sphere_class_map(c2w, h, w, focal)
        # stored as attribute-id x 10 (attribute 1='skin'->cls 1, 14='neck'->3)
        att = np.where(cls == 2, 14, cls).astype(np.uint8)
        Image.fromarray((att * 10).astype(np.uint8)).save(
            os.path.join(root, "edit_parse", f"{name}.png"))
        Image.fromarray((att * 10).astype(np.uint8)).save(
            os.path.join(root, "raw_parse", f"{name}.png"))
        x, y, z, t = c2w[:, 0], c2w[:, 1], c2w[:, 2], c2w[:, 3]
        pose_drb = np.stack([-y, x, z, t], 1)
        hwf = np.array([[h], [w], [focal]], np.float32)
        poses_bounds.append(np.concatenate(
            [np.concatenate([pose_drb, hwf], 1).flatten(),
             [cam_dist - 1.5, cam_dist + 1.5]]))
    np.save(os.path.join(root, "poses_bounds.npy"), np.stack(poses_bounds))
    return root


def render_room_scene(c2w, h, w, focal, radius=1.0, room_radius=4.5):
    """Analytic sphere-in-a-room scene: Lambertian red sphere at the origin
    enclosed by an inward-facing wall sphere with a smooth position-coded
    color. Every ray terminates on geometry — the structure of a real
    Replica indoor scan. (An earlier open fixture left 85%+ of rays ending
    on a white void at infinity; with white_back=False that trains into the
    near-plane-floater local minimum — sigma saturates at the first sample,
    every frame renders constant white, PSNR pins at ~11.7 dB forever.)

    Returns (rgb f32 (h,w,3) in [0,1], depth_m f32 (h,w), cls uint8 (h,w))
    with cls 0 = wall, 1 = sphere x<0, 2 = sphere x>0.
    """
    j, i = np.meshgrid(np.arange(h, dtype=np.float32),
                       np.arange(w, dtype=np.float32), indexing="ij")
    dirs = np.stack([(i - w / 2) / focal, -(j - h / 2) / focal, -np.ones_like(i)], -1)
    dirs = dirs @ c2w[:, :3].T
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    o = c2w[:, 3]

    # inner sphere (nearest root)
    b = 2 * np.sum(dirs * o, -1)
    c = np.sum(o * o) - radius ** 2
    disc = b ** 2 - 4 * c
    hit = disc > 0
    t_s = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0))) / 2, np.inf)
    # wall sphere (camera inside -> farthest root is the forward hit)
    c_w = np.sum(o * o) - room_radius ** 2
    disc_w = b ** 2 - 4 * c_w
    t_w = (-b + np.sqrt(np.maximum(disc_w, 0))) / 2

    t = np.where(hit, t_s, t_w)
    pts = o + dirs * t[..., None]

    light = np.array([0.5, 0.5, 0.8])
    light = light / np.linalg.norm(light)
    lam = np.clip(np.sum(pts / radius * light, -1), 0.1, 1.0)
    sphere_rgb = np.asarray([1.0, 0.2, 0.2]) * lam[..., None]
    # wall: smooth low-frequency position code a 32-sample field can fit
    n_w = pts / room_radius
    wall_rgb = 0.55 + 0.35 * n_w
    rgb = np.where(hit[..., None], sphere_rgb, wall_rgb)
    cls = np.where(hit, np.where(pts[..., 0] > 0, 2, 1), 0).astype(np.uint8)
    return np.clip(rgb, 0, 1), t.astype(np.float32), cls


def make_replica_dataset(root, n_frames=10, hw=(40, 30)):
    """Replica-format scene (traj_w_c.txt + rgb/depth/semantic_class dirs):
    the sphere-in-a-room analytic scene — closed geometry like a real
    Replica scan (see render_room_scene for why the room matters)."""
    import cv2
    w, h = hw
    for d in ("rgb", "depth", "semantic_class"):
        os.makedirs(os.path.join(root, d), exist_ok=True)
    focal = w / 2.0  # hfov=90
    Ts = []
    for k in range(n_frames):
        theta = 2 * np.pi * k / n_frames
        eye = 3.0 * np.array([np.cos(theta), np.sin(theta), 0.3])
        # opengl-style look-at, then flip to the opencv convention
        # (x right, y down, z forward): y_cv = -y_gl, z_cv = -z_gl
        gl = _look_at(eye)
        cv_pose = np.stack([gl[:, 0], -gl[:, 1], -gl[:, 2], gl[:, 3]], 1)
        T = np.concatenate([cv_pose, [[0, 0, 0, 1.0]]], 0)
        Ts.append(T)
        rgb, depth_m, cls = render_room_scene(gl, h, w, focal)
        img = (rgb * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(root, "rgb", f"rgb_{k}.png"), img[..., ::-1])
        depth_mm = np.clip(depth_m * 1000, 0, 65535).astype(np.uint16)
        cv2.imwrite(os.path.join(root, "depth", f"depth_{k}.png"), depth_mm)
        cv2.imwrite(os.path.join(root, "semantic_class", f"semantic_class_{k}.png"),
                    cls)
    np.savetxt(os.path.join(root, "traj_w_c.txt"),
               np.stack(Ts).reshape(n_frames, 16), delimiter=" ")
    return root
