"""Headless CLI replaying the reference's GUI workflow (README "Example
workflow": find features -> correspondences -> calibrate -> depth maps).

Usage:
  python -m stereoreconstruction_tpu.cli detect    project.xml [--kind surf]
  python -m stereoreconstruction_tpu.cli match     project.xml
  python -m stereoreconstruction_tpu.cli calibrate project.xml -o out.xml
  python -m stereoreconstruction_tpu.cli refraction project.xml -o out.xml
  python -m stereoreconstruction_tpu.cli stereo    project.xml --image-set bunny
  python -m stereoreconstruction_tpu.cli hdr       project.xml --image-set x
  python -m stereoreconstruction_tpu.cli layout    project.xml -o layout.png
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def _load(path):
    from .data.project_io import load_project
    return load_project(path)


def cmd_info(args):
    proj = _load(args.project)
    print(f"cameras: {len(proj.cameras)}  image sets: "
          f"{len(proj.image_sets)}")
    for cid, cam in proj.cameras.items():
        refr = (f" refractive(n={cam.refr_index}, d={cam.refr_dist})"
                if abs(cam.refr_index - 1) > 1e-10 else "")
        print(f"  camera {cid}{refr}")
    for sid, iset in proj.image_sets.items():
        print(f"  set {sid}: {len(iset.images)} images")
    nf = sum(len(v) for v in proj.features.values())
    nc = sum(len(v) for v in proj.correspondences.values())
    print(f"features: {nf}  correspondences: {nc}")


def cmd_detect(args):
    from .features.detect import detect_checkerboards, detect_surf
    from .data.project_io import save_project
    proj = _load(args.project)
    if args.kind == "checkerboard":
        n = detect_checkerboards(
            proj, cols=args.cols - 1, rows=args.rows - 1,
            image_set_ids=args.image_set or None,
            progress=lambda d, t: print(f"\r{d}/{t}", end="",
                                        file=sys.stderr))
        print(f"\ndetected full boards on {n} images")
    else:
        n = detect_surf(proj, image_set_ids=args.image_set or None,
                        threshold=args.threshold)
        print(f"detected SURF features on {n} images")
    save_project(proj, args.output or args.project)


def cmd_match(args):
    from .features.detect import find_all_correspondences
    from .data.project_io import save_project
    proj = _load(args.project)
    n = find_all_correspondences(proj)
    print(f"stored correspondences for {n} image pairs")
    save_project(proj, args.output or args.project)


def cmd_calibrate(args):
    from .config import CalibrationConfig
    from .calib.rig import CameraCalibration
    from .features.detect import gather_calibration_points
    from .data.project_io import save_project
    from .data.images import load_image

    proj = _load(args.project)
    cfg = CalibrationConfig(board_cols=args.cols - 1,
                            board_rows=args.rows - 1,
                            cell_size=args.cell_size,
                            use_bundle_adjust=args.bundle_adjust)
    cam_ids = sorted(proj.cameras)
    set_ids = sorted(s for s in proj.image_sets
                     if any((s, c) in proj.features for c in cam_ids))
    if not set_ids:
        print("no feature sets — run `detect` first", file=sys.stderr)
        return 1
    n_corners = cfg.board_cols * cfg.board_rows
    pts = gather_calibration_points(proj, cam_ids, set_ids, n_corners)

    sizes = []
    for cid in cam_ids:
        img = proj.image_sets[set_ids[0]].default_image_for_camera(cid)
        li = load_image(img.file, 1.0)
        sizes.append((li.rgb.shape[1], li.rgb.shape[0]))

    calib = CameraCalibration(pts, sizes, cfg)
    res = calib.calibrate()
    print(f"mean reprojection error: {res.error:.4f} px "
          f"(per-iteration: {[round(e, 3) for e in res.per_iteration_errors]})")
    if res.outlier_observations:
        dropped = [(cam_ids[c], set_ids[s])
                   for c, s in res.outlier_observations]
        print(f"pruned {len(dropped)} inconsistent board observations "
              f"(all-boards error {res.error_all:.2f} px): {dropped}")

    for i, cid in enumerate(cam_ids):
        st = res.state
        P = st.K[i] @ np.hstack([st.R[i], st.t[i][:, None]])
        proj.cameras[cid].P = P
        proj.cameras[cid].dist = st.dist[i]
    save_project(proj, args.output or args.project)
    return 0


def cmd_refraction(args):
    from .calib.refraction import (calibrate, default_model,
                                   gather_correspondences, total_error)
    from .data.project_io import save_project

    proj = _load(args.project)
    cam_ids = sorted(proj.cameras)
    set_ids = args.image_set or sorted(proj.image_sets)
    cams = [proj.cameras[c].to_camera() for c in cam_ids]
    p1, p2, v1, v2 = gather_correspondences(proj, cam_ids, set_ids)
    if len(p1) == 0:
        print("no correspondences — run `detect` + `match` first",
              file=sys.stderr)
        return 1
    print(f"{len(p1)} correspondences")
    res = calibrate(cams, p1, p2, v1, v2)
    print(f"chi2: {res.chi2_before:.2f} -> {res.chi2_after:.2f} "
          f"({res.iterations} iters), n = {res.refractive_index:.4f}")
    for i, cid in enumerate(cam_ids):
        px, py, d = res.plane_params(i)
        rec = proj.cameras[cid]
        rec.refr_px, rec.refr_py = px, py
        rec.refr_dist = d
        rec.refr_index = res.refractive_index
    save_project(proj, args.output or args.project)
    return 0


def cmd_stereo(args):
    import jax
    import jax.numpy as jnp
    from .config import MultiViewConfig, TwoViewConfig
    from .data.images import load_image
    from .data.ply import write_ply
    from .parallel.launcher import initialize_distributed
    from .runtime.trace import metric as trace_metric
    from .stereo.multiview import mvs_depth_maps, depth_maps_to_ply
    from .stereo.twoview import compute_depth_maps
    from .viz.render import save_depth_image

    # Join a multi-host cluster when JAX_COORDINATOR/JAX_NUM_PROCESSES is
    # set (no-op single-process) — the pod launch documented at
    # parallel/launcher.py:17-21.  Sharded engines below then see the
    # *global* device set.
    initialize_distributed()

    proj = _load(args.project)
    iset = proj.image_sets[args.image_set]
    cam_ids = args.cameras or sorted(
        c for c in proj.cameras
        if iset.default_image_for_camera(c) is not None)
    cams = [proj.cameras[c].to_camera() for c in cam_ids]
    imgs = [load_image(iset.default_image_for_camera(c).file, args.scale)
            for c in cam_ids]
    outdir = args.output or "."
    os.makedirs(outdir, exist_ok=True)

    n_dev = len(jax.devices())
    shard = args.shard
    if shard == "auto":
        shard = ("row" if args.two_view else "depth") if n_dev > 1 \
            else "none"
    if args.mrf and shard != "none":
        print("--mrf runs unsharded (dense-label volume)", file=sys.stderr)
        shard = "none"
    # explicit but inapplicable --shard values fall through to the
    # unsharded path — say so instead of silently ignoring (ADVICE r3)
    if shard == "depth" and args.two_view:
        print("--shard depth does not apply to --two-view; "
              "running unsharded (use --shard row)", file=sys.stderr)
    if shard == "row" and not args.two_view:
        print("--shard row does not apply to MVS; running unsharded "
              "(use --shard depth)", file=sys.stderr)
    if shard in ("row", "depth") and n_dev == 1:
        print(f"--shard {shard} requested but only 1 device is "
              "visible; running unsharded", file=sys.stderr)
    if (shard == "depth" and not args.two_view and n_dev > 1
            and args.method == "exact"):
        print("--shard depth has no 'exact' slab backend; running the "
              "fast warp path per slab (ADVICE r4)", file=sys.stderr)

    if args.two_view:
        cfg = TwoViewConfig(min_depth=args.min_depth,
                            max_depth=args.max_depth,
                            num_depth_levels=args.depth_levels,
                            image_scale=args.scale)
        if shard == "row" and n_dev > 1:
            from .parallel.rowshard import (
                make_mesh, stack_cameras, twoview_pairs_rowsharded)
            mesh = make_mesh(1, n_dev)
            print(f"row-sharded over {n_dev} devices", file=sys.stderr)
            dl, dr = twoview_pairs_rowsharded(
                mesh, imgs[0].rgb[None], imgs[0].mask[None],
                imgs[1].rgb[None], imgs[1].mask[None],
                stack_cameras([cams[0]]), stack_cameras([cams[1]]),
                cfg, method=args.method)
            depths = np.stack([np.asarray(dl[0]), np.asarray(dr[0])])
        else:
            res = compute_depth_maps(
                imgs[0].rgb, imgs[0].mask, imgs[1].rgb, imgs[1].mask,
                cams[0], cams[1], cfg, method=args.method,
                use_mrf=args.mrf)
            depths = np.stack([np.asarray(res.depth_left),
                               np.asarray(res.depth_right)])
        style = "twoview"
    else:
        cfg = MultiViewConfig(min_depth=args.min_depth,
                              max_depth=args.max_depth,
                              num_depth_levels=args.depth_levels,
                              cross_check_threshold=args.cross_check,
                              image_scale=args.scale,
                              use_mrf=args.mrf)
        ckpt = None
        if args.resume:
            from .runtime.checkpoint import DepthCheckpoint
            ckpt = DepthCheckpoint(os.path.join(outdir, "checkpoint"), cfg)
        depth_mesh = None
        if shard == "depth" and n_dev > 1:
            from .parallel.depthshard import make_depth_mesh
            n_dep = max(d for d in range(1, n_dev + 1)
                        if args.depth_levels % d == 0)
            if n_dep > 1:
                depth_mesh = make_depth_mesh(n_dep)
                print(f"depth-slab sharded over {n_dep} devices",
                      file=sys.stderr)
        depths = np.asarray(mvs_depth_maps(
            np.stack([i.rgb for i in imgs]),
            np.stack([i.mask for i in imgs]), cams, cfg,
            method=args.method, checkpoint=ckpt, view_ids=cam_ids,
            depth_mesh=depth_mesh))
        style = "mvs"

    if args.save_npz:
        np.savez_compressed(
            args.save_npz, depths=depths,
            cam_ids=np.asarray(cam_ids[:len(depths)]))
        print(f"wrote raw depths to {args.save_npz}")

    for i, cid in enumerate(cam_ids[:len(depths)]):
        d = depths[i]
        have = np.isfinite(d) & (d > 0)
        trace_metric(f"stereo/coverage/{cid}", 100.0 * have.mean(), "%")
        print(f"{cid}: {100.0 * have.mean():.1f}% of pixels have depth "
              "hypotheses")
        save_depth_image(d, os.path.join(outdir, f"depth_{cid}.png"),
                         args.min_depth, args.max_depth, style=style)

    if not args.two_view:
        pts, cols = depth_maps_to_ply(
            depths, np.stack([i.rgb for i in imgs]), cams, cfg)
        ply = os.path.join(outdir, f"{args.image_set}.ply")
        write_ply(ply, pts, cols)
        print(f"wrote {len(pts)} points to {ply}")
    return 0


def cmd_hdr(args):
    from .data.images import load_image
    from .data.formats import write_exr, write_rgbe
    from .hdr.response import recover_response
    from .hdr.merge import merge_hdr

    proj = _load(args.project)
    iset = proj.image_sets[args.image_set]
    cam_id = args.cameras[0] if args.cameras else sorted(proj.cameras)[0]
    stack = [(img, img.exposure) for img in iset.images
             if img.camera_id == cam_id and img.exposure > 0]
    if len(stack) < 2:
        print("need >= 2 exposures with exposure metadata", file=sys.stderr)
        return 1
    images = [load_image(im.file, 1.0).rgb for im, _ in stack]
    exps = [e for _, e in stack]
    resp = recover_response(images, exps)
    hdr = merge_hdr(images, exps, resp)
    out = args.output or f"{args.image_set}_{cam_id}.exr"
    if out.endswith(".hdr"):
        write_rgbe(out, hdr)
    else:
        write_exr(out, hdr)
    print(f"wrote {out}")
    return 0


def cmd_layout(args):
    from .viz.render import render_camera_layout
    proj = _load(args.project)
    cam_ids = sorted(proj.cameras)
    cams = [proj.cameras[c].to_camera() for c in cam_ids]
    out = args.output or "layout.png"
    render_camera_layout(cams, out, names=cam_ids)
    print(f"wrote {out}")


def cmd_cloud(args):
    """Render a PLY point cloud/mesh to a PNG (PointsViewScene equivalent;
    --splats uses the Botsch-Kobbelt surface-splat path,
    gui/widgets/pointsviewscene.cpp USE_SPLATS)."""
    from .data.ply import read_ply_full, generate_normals
    d = read_ply_full(args.ply)
    out = args.output or os.path.splitext(args.ply)[0] + ".png"
    if args.splats:
        from .viz.splats import render_splats
        normals = d.normals
        if normals is None:
            normals = generate_normals(d.points, d.faces)
        render_splats(d.points, d.colors, out, normals=normals,
                      elev=args.elev, azim=args.azim,
                      width=args.size, height=args.size)
    else:
        from .viz.render import render_point_cloud
        render_point_cloud(d.points, d.colors, out,
                           elev=args.elev, azim=args.azim)
    print(f"wrote {out} ({len(d.points)} points)")
    return 0


def cmd_convert_raw(args):
    """RAW (GRBG Bayer) -> PNG conversion over a directory tree, replicating
    MainWindow::on_actionConvert_RAW_images_triggered (gui/mainwindow.cpp:
    1054-1104): recurse, take ``*.raw`` files whose size is exactly w*h,
    demosaic (edge-sensing by default, like the GUI), write ``<base>.png``
    alongside.  The reference always deletes the original (and even deletes
    wrong-sized files); we only do so under --delete."""
    from PIL import Image
    from .data import demosaic as dm
    algo = {"es": dm.demosaic_es, "nn": dm.demosaic_nn,
            "bl": dm.demosaic_bl, "hue": dm.demosaic_hue}[args.algorithm]
    w, h = args.width, args.height
    n = 0
    for root, _dirs, files in os.walk(args.dir):
        for fname in files:
            if not fname.endswith(".raw"):
                continue
            path = os.path.join(root, fname)
            if os.path.getsize(path) != w * h:
                print(f"skipping {path}: size != {w * h}", file=sys.stderr)
                continue
            raw = np.fromfile(path, np.uint8).reshape(h, w)
            rgb = algo(raw)
            out = os.path.splitext(path)[0] + ".png"
            Image.fromarray(rgb.astype(np.uint8), "RGB").save(out)
            if args.delete:
                os.remove(path)
            n += 1
    print(f"converted {n} RAW images")
    return 0


def cmd_pmvs(args):
    """Export the project in PMVS-2 input layout (projection matrices +
    images + option.txt), replicating MainWindow's PMVS export + PMVSDialog
    (gui/mainwindow.cpp:983-1035, gui/dialogs/pmvsdialog.cpp:52-71).
    Prints the pmvs-2 command line instead of spawning it."""
    from .data.pmvs import export_pmvs
    proj = _load(args.project)
    if not args.image_set:
        p = argparse.ArgumentParser()
        p.error("pmvs requires --image-set")
    iset = proj.image_sets[args.image_set]
    cam_ids = args.cameras or sorted(
        c for c in proj.cameras
        if iset.default_image_for_camera(c) is not None)
    recs = [proj.cameras[c] for c in cam_ids]
    paths = [iset.default_image_for_camera(c).file for c in cam_ids]
    out = args.output or "pmvs"
    argv = export_pmvs(out, recs, paths, level=args.level,
                       csize=args.csize, threshold=args.pmvs_threshold,
                       wsize=args.wsize, min_image_num=args.min_image_num)
    print(f"exported {len(paths)} views to {out}")
    print("run:", " ".join(argv))
    return 0


def cmd_edit(args):
    """Headless project editing: the GUI's project-tree CRUD
    (MainWindow, gui/mainwindow.cpp:1221-1408 — add/remove/rename cameras
    and image sets) and the camera parameter editors (CameraInfoWidget;
    StereoWidget's live refractive-interface spinners,
    gui/widgets/stereowidget.cpp:472-549).  Removing a camera or image set
    also drops its features/correspondences, like the reference's Project
    registry teardown."""
    from .data.project_io import (save_project, CameraRecord,
                                  ImageSetRecord, ImageRecord)
    proj = _load(args.project)

    def camera(cid):
        if cid not in proj.cameras:
            print(f"no camera {cid!r}", file=sys.stderr)
            raise SystemExit(1)
        return proj.cameras[cid]

    def floats(s, n, what):
        v = [float(x) for x in s.split(",")]
        if len(v) != n:
            print(f"{what} needs {n} comma-separated values, got {len(v)}",
                  file=sys.stderr)
            raise SystemExit(1)
        return v

    for cid in args.add_camera or []:
        if cid in proj.cameras:
            print(f"camera {cid!r} exists", file=sys.stderr)
            return 1
        P = np.zeros((3, 4))
        P[:, :3] = np.eye(3)
        proj.cameras[cid] = CameraRecord(id=cid, name=cid, P=P,
                                         dist=np.zeros(5))
    for sid in args.add_set or []:
        if sid in proj.image_sets:
            print(f"image set {sid!r} exists", file=sys.stderr)
            return 1
        proj.image_sets[sid] = ImageSetRecord(
            id=sid, name=sid,
            root=os.path.dirname(os.path.abspath(args.project)))
    for sid, cid, path in args.add_image or []:
        iset = proj.image_sets.get(sid)
        if iset is None:
            print(f"no image set {sid!r}", file=sys.stderr)
            return 1
        camera(cid)
        iset.images.append(ImageRecord(
            file=os.path.abspath(path), camera_id=cid,
            is_default=iset.default_image_for_camera(cid) is None))

    for cid, px, py, dist, ratio in args.set_interface or []:
        rec = camera(cid)
        rec.refr_px, rec.refr_py = float(px), float(py)
        rec.refr_dist, rec.refr_index = float(dist), float(ratio)
    for cid in args.clear_interface or []:
        rec = camera(cid)
        rec.refr_px = rec.refr_py = rec.refr_dist = 0.0
        rec.refr_index = 1.0
    for cid, vals in args.set_distortion or []:
        camera(cid).dist = np.asarray(floats(vals, 5, "--set-distortion"))
    for cid, vals in args.set_p or []:
        camera(cid).P = np.asarray(
            floats(vals, 12, "--set-p")).reshape(3, 4)
    for cid, name in args.rename_camera or []:
        camera(cid).name = name
    for sid, name in args.rename_set or []:
        if sid not in proj.image_sets:
            print(f"no image set {sid!r}", file=sys.stderr)
            return 1
        proj.image_sets[sid].name = name

    for cid in args.remove_camera or []:
        camera(cid)
        del proj.cameras[cid]
        for iset in proj.image_sets.values():
            iset.images = [im for im in iset.images
                           if im.camera_id != cid]
        proj.features = {k: v for k, v in proj.features.items()
                         if k[1] != cid}
        proj.correspondences = {
            k: v for k, v in proj.correspondences.items()
            if cid not in (k[1], k[3])}
    for sid in args.remove_set or []:
        if sid not in proj.image_sets:
            print(f"no image set {sid!r}", file=sys.stderr)
            return 1
        del proj.image_sets[sid]
        proj.features = {k: v for k, v in proj.features.items()
                         if k[0] != sid}
        proj.correspondences = {
            k: v for k, v in proj.correspondences.items()
            if sid not in (k[0], k[2])}

    save_project(proj, args.output or args.project)
    print(f"saved {args.output or args.project}: "
          f"{len(proj.cameras)} cameras, {len(proj.image_sets)} sets")
    return 0


def _enable_compile_cache():
    """Persistent jit cache for repeat CLI invocations, incl. sub-1s
    eager-op modules (each costs a ~0.4 s remote-compile RPC on a
    tunneled chip and the default threshold refuses to persist them)."""
    import jax
    cache = os.path.join(os.path.expanduser("~"), ".cache",
                         "stereoreconstruction_tpu", "jax")
    try:
        os.makedirs(cache, exist_ok=True)
    except OSError:
        return                   # read-only home: run uncached
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main(argv=None):
    _enable_compile_cache()
    p = argparse.ArgumentParser(prog="stereoreconstruction_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("project")
        sp.add_argument("-o", "--output")
        sp.add_argument("--image-set", action="append", default=None)
        sp.add_argument("--cameras", nargs="*", default=None)
        sp.add_argument("--trace", metavar="JSON", nargs="?", const="-",
                        default=None,
                        help="print a stage-timer/metric summary to stderr "
                             "on exit; with a path, also dump structured "
                             "JSON there")
        sp.add_argument("--device-trace", metavar="LOGDIR", default=None,
                        help="capture a jax/XLA device profile of the whole "
                             "command into LOGDIR (view with xprof)")

    sp = sub.add_parser("info")
    common(sp)
    sp.set_defaults(fn=cmd_info)

    sp = sub.add_parser("detect")
    common(sp)
    sp.add_argument("--kind", choices=("checkerboard", "surf"),
                    default="checkerboard")
    sp.add_argument("--rows", type=int, default=10)   # GUI defaults
    sp.add_argument("--cols", type=int, default=12)
    sp.add_argument("--threshold", type=float, default=100.0)
    sp.set_defaults(fn=cmd_detect)

    sp = sub.add_parser("match")
    common(sp)
    sp.set_defaults(fn=cmd_match)

    sp = sub.add_parser("calibrate")
    common(sp)
    sp.add_argument("--rows", type=int, default=10)
    sp.add_argument("--cols", type=int, default=12)
    sp.add_argument("--cell-size", type=float, default=11.0)
    sp.add_argument("--bundle-adjust", action="store_true")
    sp.set_defaults(fn=cmd_calibrate)

    sp = sub.add_parser("refraction")
    common(sp)
    sp.set_defaults(fn=cmd_refraction)

    sp = sub.add_parser("stereo")
    common(sp)
    sp.add_argument("--min-depth", type=float, default=300.0)
    sp.add_argument("--max-depth", type=float, default=800.0)
    sp.add_argument("--depth-levels", type=int, default=100)
    sp.add_argument("--cross-check", type=float, default=5.0)
    sp.add_argument("--scale", type=float, default=0.5)
    sp.add_argument("--two-view", action="store_true")
    sp.add_argument("--mrf", action="store_true",
                    help="MRF optimization over the cost volume instead of "
                         "WTA (two-view: min-sum BP over dense labels; "
                         "MVS: TRW-S over the top-K hypothesis volume)")
    sp.add_argument("--method", choices=("auto", "fast", "pallas", "exact"),
                    default="auto",
                    help="two-view cost-volume backend; auto = the fused "
                         "Pallas kernel on TPU (bench winner), the XLA "
                         "fast path elsewhere (see "
                         "stereo.twoview.resolve_method)")
    sp.add_argument("--shard", choices=("auto", "none", "row", "depth"),
                    default="auto",
                    help="multi-device sharding: row-blocks for two-view, "
                         "depth-slabs for MVS; auto = shard when >1 "
                         "device is visible (after joining a cluster via "
                         "JAX_COORDINATOR/JAX_NUM_PROCESSES/"
                         "JAX_PROCESS_ID)")
    sp.add_argument("--save-npz", metavar="FILE",
                    help="also write the raw depth maps (npz: depths "
                         "[V, H, W] + cam_ids)")
    sp.add_argument("--resume", action="store_true",
                    help="checkpoint each view's depth map under "
                         "<output>/checkpoint/ and skip views already "
                         "computed with the same config (mid-task resume)")
    sp.set_defaults(fn=cmd_stereo)

    sp = sub.add_parser("hdr")
    common(sp)
    sp.set_defaults(fn=cmd_hdr)

    sp = sub.add_parser(
        "edit", help="project CRUD + camera parameter edits (headless "
                     "CameraInfoWidget / StereoWidget spinners / "
                     "project-tree actions)")
    sp.add_argument("project")
    sp.add_argument("-o", "--output")
    sp.add_argument("--set-interface", nargs=5, action="append",
                    metavar=("CAM", "PX", "PY", "DIST", "RATIO"),
                    help="set a camera's refractive interface (the "
                         "StereoWidget spinners)")
    sp.add_argument("--clear-interface", action="append", metavar="CAM")
    sp.add_argument("--set-distortion", nargs=2, action="append",
                    metavar=("CAM", "K1,K2,P1,P2,K3"))
    sp.add_argument("--set-p", nargs=2, action="append",
                    metavar=("CAM", "M11,...,M34"),
                    help="set the 3x4 projection matrix (row-major, 12 "
                         "comma-separated values)")
    sp.add_argument("--rename-camera", nargs=2, action="append",
                    metavar=("CAM", "NAME"))
    sp.add_argument("--rename-set", nargs=2, action="append",
                    metavar=("SET", "NAME"))
    sp.add_argument("--add-camera", action="append", metavar="ID")
    sp.add_argument("--remove-camera", action="append", metavar="ID")
    sp.add_argument("--add-set", action="append", metavar="ID")
    sp.add_argument("--remove-set", action="append", metavar="ID")
    sp.add_argument("--add-image", nargs=3, action="append",
                    metavar=("SET", "CAM", "FILE"))
    sp.set_defaults(fn=cmd_edit)

    sp = sub.add_parser("layout")
    common(sp)
    sp.set_defaults(fn=cmd_layout)

    sp = sub.add_parser("cloud")
    sp.add_argument("ply")
    sp.add_argument("-o", "--output")
    sp.add_argument("--splats", action="store_true",
                    help="Botsch-Kobbelt surface splatting (USE_SPLATS)")
    sp.add_argument("--elev", type=float, default=-70.0)
    sp.add_argument("--azim", type=float, default=-90.0)
    sp.add_argument("--size", type=int, default=800)
    sp.set_defaults(fn=cmd_cloud)

    sp = sub.add_parser("convert-raw")
    sp.add_argument("dir")
    sp.add_argument("--width", type=int, required=True)
    sp.add_argument("--height", type=int, required=True)
    sp.add_argument("--algorithm", choices=("es", "nn", "bl", "hue"),
                    default="es")
    sp.add_argument("--delete", action="store_true",
                    help="remove originals after conversion (the "
                         "reference's behavior)")
    sp.set_defaults(fn=cmd_convert_raw)

    sp = sub.add_parser("pmvs")
    common(sp)
    sp.add_argument("--level", type=int, default=1)
    sp.add_argument("--csize", type=int, default=2)
    sp.add_argument("--pmvs-threshold", type=float, default=0.7)
    sp.add_argument("--wsize", type=int, default=7)
    sp.add_argument("--min-image-num", type=int, default=3)
    sp.set_defaults(fn=cmd_pmvs)

    args = p.parse_args(argv)
    if getattr(args, "image_set", None) and args.cmd in ("stereo", "hdr",
                                                         "pmvs"):
        args.image_set = args.image_set[0]

    if args.cmd != "stereo":
        # Host-side workloads (feature detection, calibration LM, I/O) are
        # tiny-op dominated: keep them off the accelerator so they don't
        # round-trip through the device per op.
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    import contextlib
    from .runtime import trace as tracing
    with contextlib.ExitStack() as stack:
        if getattr(args, "device_trace", None):
            stack.enter_context(tracing.device_trace(args.device_trace))
        with tracing.trace(args.cmd):
            rc = args.fn(args) or 0
    if getattr(args, "trace", None) is not None:
        print(tracing.summary(), file=sys.stderr)
        if args.trace != "-":
            tracing.get_tracer().dump_json(args.trace)
    return rc


if __name__ == "__main__":
    sys.exit(main())
