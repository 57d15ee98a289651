import numpy as np
import jax
import jax.numpy as jnp

from madicp_tpu.ops.tree import (
    build_tree,
    search_tree,
    get_leaves,
    count_leaves,
    transform_tree,
    tree_arena_size,
)
import reference_oracle as oracle


def _build(points, b_max, b_min, depth, pad_to=None):
    n = points.shape[0]
    pad_to = pad_to or n
    pts = np.zeros((pad_to, 3))
    pts[:n] = points
    valid = np.zeros(pad_to, bool)
    valid[:n] = True
    tree, point_leaf = jax.jit(
        lambda p, v: build_tree(p, v, depth=depth, b_max=b_max, b_min=b_min)
    )(jnp.asarray(pts), jnp.asarray(valid))
    return tree, np.asarray(point_leaf), valid


def _partition_ours(point_leaf, valid):
    groups = {}
    for i, lid in enumerate(point_leaf):
        if not valid[i]:
            continue
        groups.setdefault(int(lid), []).append(i)
    return {frozenset(v) for v in groups.values()}


def _partition_oracle(root):
    return {frozenset(l.point_idx.tolist()) for l in oracle.leaves(root)}


def test_partition_matches_oracle(rng):
    pts = rng.uniform(-2, 2, size=(400, 3))
    pts[:, 2] *= 0.2
    tree, point_leaf, valid = _build(pts, b_max=0.5, b_min=0.2, depth=12)
    root = oracle.build(pts, b_max=0.5, b_min=0.2)
    assert _partition_ours(point_leaf, valid) == _partition_oracle(root)


def test_leaf_data_matches_oracle(four_walls):
    pts = four_walls
    b_max, b_min = 0.2, 0.1
    tree, point_leaf, valid = _build(pts, b_max, b_min, depth=14)
    root = oracle.build(pts, b_max, b_min)

    ours = {}
    t_repr = np.asarray(tree.repr)
    t_norm = np.asarray(tree.normal)
    t_bbox0 = np.asarray(tree.bbox0)
    for i, lid in enumerate(point_leaf):
        ours.setdefault(int(lid), set()).add(i)
    ours_by_set = {
        frozenset(v): (t_repr[k], t_norm[k], t_bbox0[k]) for k, v in ours.items()
    }
    n_checked = 0
    for leaf in oracle.leaves(root):
        key = frozenset(leaf.point_idx.tolist())
        assert key in ours_by_set
        r, n, b0 = ours_by_set[key]
        np.testing.assert_allclose(r, leaf.repr, atol=1e-9)
        # normals match up to sign
        assert abs(abs(n @ leaf.normal) - 1.0) < 1e-6
        np.testing.assert_allclose(b0, leaf.bbox[0], atol=1e-9)
        n_checked += 1
    assert n_checked == int(np.asarray(count_leaves(tree)))


def test_per_point_leaves_self_match(four_walls):
    # per-point leaves at b_max=1e-5: searching the build cloud returns
    # each point exactly (the nn_search oracle, tools/README.md:9-10)
    pts = four_walls[:512]
    tree, point_leaf, valid = _build(pts, b_max=1e-5, b_min=0.1, depth=13)
    leaf = np.asarray(search_tree(tree, jnp.asarray(pts)))
    matched = np.asarray(tree.repr)[leaf]
    np.testing.assert_allclose(matched, pts, atol=1e-12)


def test_search_matches_oracle(rng, four_walls):
    pts = four_walls
    b_max, b_min = 0.2, 0.1
    tree, _, _ = _build(pts, b_max, b_min, depth=14)
    root = oracle.build(pts, b_max, b_min)
    queries = pts[rng.integers(0, len(pts), 200)] + rng.normal(
        size=(200, 3)
    ) * 0.03
    leaf = np.asarray(search_tree(tree, jnp.asarray(queries)))
    t_repr = np.asarray(tree.repr)
    for q, lid in zip(queries, leaf):
        ref_leaf = oracle.search(root, q)
        np.testing.assert_allclose(t_repr[lid], ref_leaf.repr, atol=1e-9)


def test_normal_inheritance_on_plane(rng):
    # one plane, small extents: plane predecessor makes descendant leaf
    # normals identical (mad_tree.cpp:65-67, 90-93)
    n = 2000
    pts = np.column_stack(
        [
            rng.uniform(0, 4, n),
            rng.uniform(0, 4, n),
            rng.normal(size=n) * 0.001,
        ]
    )
    tree, point_leaf, valid = _build(pts, b_max=0.5, b_min=0.1, depth=12)
    flag = np.asarray(tree.is_leaf & tree.is_real)
    normals = np.asarray(tree.normal)[flag]
    z = np.array([0.0, 0.0, 1.0])
    align = np.abs(normals @ z)
    assert np.all(align > 0.999)


def test_padding_invariance(rng):
    pts = rng.uniform(-1, 1, size=(300, 3))
    t1, pl1, v1 = _build(pts, 0.3, 0.1, depth=11)
    t2, pl2, v2 = _build(pts, 0.3, 0.1, depth=11, pad_to=512)
    assert _partition_ours(pl1, v1) == _partition_ours(
        pl2[:512], v2
    )
    assert int(np.asarray(count_leaves(t1))) == int(np.asarray(count_leaves(t2)))


def test_get_leaves_compaction(four_walls):
    pts = four_walls
    tree, _, _ = _build(pts, 0.2, 0.1, depth=14)
    leaves = get_leaves(tree, max_leaves=pts.shape[0])
    n_leaves = int(np.asarray(count_leaves(tree)))
    assert int(np.asarray(jnp.sum(leaves.valid))) == n_leaves
    # valid entries come first
    lv = np.asarray(leaves.valid)
    assert np.all(lv[:n_leaves]) and not np.any(lv[n_leaves:])


def test_transform_tree(rng, four_walls):
    from scipy.spatial.transform import Rotation

    pts = four_walls[:1000]
    tree, _, _ = _build(pts, 0.2, 0.1, depth=12)
    R = Rotation.from_rotvec([0.2, -0.1, 0.4]).as_matrix()
    t = np.array([1.0, -2.0, 0.5])
    moved = transform_tree(tree, jnp.asarray(R), jnp.asarray(t))
    # searching the moved tree with moved queries reproduces matches
    q = pts[:50]
    l1 = np.asarray(search_tree(tree, jnp.asarray(q)))
    l2 = np.asarray(search_tree(moved, jnp.asarray(q @ R.T + t)))
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_allclose(
        np.asarray(moved.repr)[l2], np.asarray(tree.repr)[l1] @ R.T + t, atol=1e-9
    )


def test_forced_depth_cap(rng):
    # depth cap turns oversized nodes into leaves instead of failing
    pts = rng.uniform(-10, 10, size=(256, 3))
    tree, point_leaf, valid = _build(pts, b_max=1e-4, b_min=1e-5, depth=4)
    assert tree.mean.shape[0] == tree_arena_size(4)
    # every point is assigned to some real leaf
    flag = np.asarray(tree.is_leaf & tree.is_real)
    assert all(flag[lid] for lid in point_leaf[valid[: len(point_leaf)]])


def test_single_and_two_point_nodes(rng):
    # tiny clouds exercise the <3-point normal walk (mad_tree.cpp:68-73) and
    # the always-degenerate 2-point plane predecessor (bbox0 == 0 < b_min,
    # mad_tree.cpp:90-93). For a rank-1 ancestor covariance the inherited
    # normal is only defined up to the degenerate 2D subspace (Eigen and our
    # analytic solver may pick different, equally valid vectors), so we check
    # the structural contract: unit normal orthogonal to the ancestor's span.
    pts = rng.uniform(0, 1, size=(5, 3))
    tree, point_leaf, valid = _build(pts, b_max=1e-6, b_min=1e-7, depth=8)
    root = oracle.build(pts, b_max=1e-6, b_min=1e-7)
    assert _partition_ours(point_leaf, valid) == _partition_oracle(root)
    t_norm = np.asarray(tree.normal)

    def source_node(leaf, chain):
        # replicate the inheritance rule to find the source node's points
        node, parents = chain
        # plane predecessor: first ancestor with bbox0 < b_min
        anc = []
        c = chain
        while c is not None:
            anc.append(c[0])
            c = c[1]
        anc = anc[::-1]  # root first
        for a in anc:
            if not a.is_leaf and a.bbox[0] < 1e-7:
                return a
        n = leaf
        for a in reversed(anc):
            if n.npts >= 3:
                break
            n = a
        return n

    def chains(node, chain=None, out=None):
        out = {} if out is None else out
        if node.is_leaf:
            out[frozenset(node.point_idx.tolist())] = (node, chain)
            return out
        chains(node.left, (node, chain), out)
        chains(node.right, (node, chain), out)
        return out

    by_set = chains(root)
    for key, (leaf, chain) in by_set.items():
        lid = int(point_leaf[next(iter(key))])
        n = t_norm[lid]
        np.testing.assert_allclose(np.linalg.norm(n), 1.0, atol=1e-9)
        src = leaf if chain is None else source_node(leaf, chain)
        src_pts = pts[src.point_idx] if src.is_leaf else pts[
            sorted(set().union(*[l.point_idx.tolist() for l in oracle.leaves(src)]))
        ]
        if src.npts >= 3:
            assert abs(abs(n @ src.evecs[:, 0]) - 1.0) < 1e-6
        elif src.npts == 2:
            pair = src_pts[1] - src_pts[0]
            assert abs(n @ pair) / np.linalg.norm(pair) < 1e-9


def test_warm_start_search_refinds_leaves(rng, four_walls):
    """A descent warm-started at an ancestor of the true leaf (fast
    re-association mode) must re-find exactly that leaf when the query
    did not move."""
    from madicp_tpu.ops.tree import search_forest

    pts = four_walls
    tree, _, _ = _build(pts, 0.2, 0.1, depth=14)
    queries = jnp.asarray(pts[rng.integers(0, len(pts), 256)])
    full = search_tree(tree, queries)
    backup = 6
    warm = search_forest(
        tree.nav, queries, 0, 14,
        start=full >> backup, n_gathers=-(-backup // 3) + 1,
    )
    np.testing.assert_array_equal(np.asarray(full), np.asarray(warm))


def test_warm_start_search_tracks_small_motion(rng, four_walls):
    """Warm-started re-descent after a small query perturbation agrees
    with the full descent for (nearly) all queries — the fast-mode
    premise. Mismatches may only occur for queries within the
    perturbation of a shallow split plane."""
    from madicp_tpu.ops.tree import search_forest

    pts = four_walls
    tree, _, _ = _build(pts, 0.2, 0.1, depth=14)
    q0 = pts[rng.integers(0, len(pts), 512)]
    prev = search_tree(tree, jnp.asarray(q0))
    q1 = jnp.asarray(q0 + rng.normal(size=q0.shape) * 0.002)
    full = search_tree(tree, q1)
    backup = 6
    warm = search_forest(
        tree.nav, q1, 0, 14,
        start=prev >> backup, n_gathers=-(-backup // 3) + 1,
    )
    agree = np.mean(np.asarray(full) == np.asarray(warm))
    assert agree > 0.97, f"warm/full agreement {agree}"


def test_descent_margin_certificate_sound(rng, four_walls):
    """Path-margin certificate (certified re-association): perturbing a
    query by STRICTLY LESS than its returned margin must land in the
    SAME leaf — for every query and every perturbation direction tried."""
    from madicp_tpu.ops.tree import search_forest

    pts = four_walls
    depth = 14
    tree, _, _ = _build(pts, 0.2, 0.1, depth=depth)
    q0 = pts[rng.integers(0, len(pts), 512)] + rng.normal(
        size=(512, 3)
    ) * 0.05
    ids0, _, margin = search_forest(
        tree.nav, jnp.asarray(q0), 0, depth,
        return_blocks=True, return_margin=True,
    )
    ids0 = np.asarray(ids0)
    margin = np.asarray(margin)
    assert (margin > 0).all()
    for _ in range(8):
        d = rng.normal(size=q0.shape)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        q1 = q0 + d * (0.9 * margin[:, None])
        ids1 = np.asarray(search_forest(tree.nav, jnp.asarray(q1), 0, depth))
        np.testing.assert_array_equal(ids0, ids1)


def test_descent_margin_is_tight_enough(rng, four_walls):
    """The margin is not vacuous: beyond it, some descents DO change
    (otherwise the certificate would certify everything forever)."""
    from madicp_tpu.ops.tree import search_forest

    pts = four_walls
    depth = 14
    tree, _, _ = _build(pts, 0.2, 0.1, depth=depth)
    q0 = pts[rng.integers(0, len(pts), 512)]
    ids0, _, margin = search_forest(
        tree.nav, jnp.asarray(q0), 0, depth,
        return_blocks=True, return_margin=True,
    )
    d = rng.normal(size=q0.shape)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    q1 = q0 + d * (3.0 * np.asarray(margin)[:, None])
    ids1 = np.asarray(search_forest(tree.nav, jnp.asarray(q1), 0, depth))
    assert (np.asarray(ids0) != ids1).any()


def test_ladder_descent_matches_gather_descent(rng, four_walls):
    """The select-ladder descent (``search_forest(..., ladder=k)``) must
    agree with the pure-gather descent: leaf ids and payload blocks
    BITWISE (they are what ICP consumes), margins within the fp-noise
    floor. Margins are NOT bitwise: the ladder trace unrolls the descent
    while the gather path runs a rolled ``fori_loop``, and XLA fuses the
    side dot-product differently in the two programs (~ulp noise even at
    ``ladder=1``, whose computed rows are a pure broadcast). The noise
    is ~eps x coordinate scale, far below the certificate's
    ``eps_cert = 64 eps (1 + |t| + r)`` safety floor, so certification
    soundness is unaffected (see ``eps_cert`` in models/pipeline.py).

    Covers f32 (the 3x-bf16-split one-hot matmul path) and f64 (the
    direct-dot path), padded/invalid queries parked, partial and FULL
    ladders (the full ladder leaves parked queries' carried blocks
    unrefreshed — seeded from row 0's panel so they stay bitwise)."""
    from madicp_tpu.ops.tree import search_forest

    pts = four_walls
    q_np = pts[rng.integers(0, len(pts), 777)] + rng.normal(0, 0.05, (777, 3))
    valid_np = rng.uniform(size=777) < 0.9

    # depth 9 exercises the payload-refetch extra gather (9 % 3 == 0)
    # plus a full ladder: broadcast (1), select-tree (8), one-hot (64),
    # one-hot (512); depth 10 the non-multiple-of-3 path
    for depth in (9, 10):
        for dtype in (jnp.float32, jnp.float64):
            tpts = jnp.asarray(np.asarray(pts, float), dtype)
            tv = jnp.ones(len(pts), bool)
            tree, _ = jax.jit(
                lambda p, v: build_tree(p, v, depth=depth, b_max=0.2,
                                        b_min=0.1)
            )(tpts, tv)
            q = jnp.asarray(q_np, dtype)
            valid = jnp.asarray(valid_np)
            ids_r, blk_r, mg_r = search_forest(
                tree.nav, q, 0, depth, valid=valid,
                return_blocks=True, return_margin=True,
            )
            # fp floor for the margin agreement: same form as the
            # certificate's eps_cert (map-frame scale), per query
            eps = np.finfo(np.asarray(mg_r).dtype).eps
            mg_tol = 64.0 * eps * (1.0 + np.linalg.norm(q_np, axis=-1))
            for ladder in (1, 2, 3, 4, 8):
                ids_l, blk_l, mg_l = search_forest(
                    tree.nav, q, 0, depth, valid=valid,
                    return_blocks=True, return_margin=True, ladder=ladder,
                )
                tag = f"depth={depth} dtype={dtype} ladder={ladder}"
                np.testing.assert_array_equal(
                    np.asarray(ids_r), np.asarray(ids_l),
                    err_msg=f"{tag}: ids")
                np.testing.assert_array_equal(
                    np.asarray(blk_r), np.asarray(blk_l),
                    err_msg=f"{tag}: blocks")
                d = np.abs(np.asarray(mg_r, np.float64)
                           - np.asarray(mg_l, np.float64))
                # the big sentinel (never-considered queries) must agree
                # exactly; real margins within the eps floor
                assert np.all(d <= mg_tol), (
                    f"{tag}: margins off by {d.max():.3e} "
                    f"(floor {mg_tol.min():.3e})")


def test_build_compute_selection_bitwise(rng, four_walls, monkeypatch):
    """The build's small-level compute selection (one-hot gathers,
    masked min-reductions — r4, VERDICT r3 item 3) must be BITWISE
    identical to the plain gather/scatter build it replaces: thresholds
    zeroed via monkeypatch select the old path in-process. Chip-side
    the same identity is pinned by the r4 on-TPU A/B (commit message);
    here it guards the CPU/f64 oracle path every CI run."""
    import madicp_tpu.ops.tree as tree_mod

    pts = four_walls
    q = np.vstack([pts, rng.normal(0, 3.0, (1000, 3))])
    for dtype in (jnp.float32, jnp.float64):
        tpts = jnp.asarray(np.asarray(q, float), dtype)
        tv = jnp.asarray(rng.uniform(size=len(q)) < 0.97)
        new_tree, new_leaf = jax.jit(
            lambda p, v: build_tree(p, v, depth=12, b_max=0.2, b_min=0.1)
        )(tpts, tv)
        monkeypatch.setattr(tree_mod, "_BUILD_ONEHOT_MAX", 0)
        monkeypatch.setattr(tree_mod, "_BUILD_REDUCE_MIN_MAX", 0)
        old_tree, old_leaf = jax.jit(
            lambda p, v: build_tree(p, v, depth=12, b_max=0.2, b_min=0.1)
        )(tpts, tv)
        monkeypatch.undo()
        np.testing.assert_array_equal(
            np.asarray(new_tree.nav), np.asarray(old_tree.nav),
            err_msg=f"{dtype}: compute-selected build diverges")
        np.testing.assert_array_equal(
            np.asarray(new_leaf), np.asarray(old_leaf))


def test_onehot_select_keeps_split_dots_unfused():
    """Structural guard for a TPU-only precision hazard the CPU bitwise
    tests CANNOT catch: XLA-TPU refolds ``dot(oh,hi) + dot(oh,mid) +
    dot(oh,lo)`` into ``dot(oh, hi+mid+lo)`` with the part-sum collapsed
    to a single bf16, silently degrading the "exact" one-hot selection
    to ~0.4% relative error (observed on chip, r4). The fix keeps an
    ``optimization_barrier`` around each dot; this test pins the lowered
    program shape — three dots and three barriers — so the barriers
    cannot be dropped without failing CI on any backend."""
    from madicp_tpu.ops.tree import _select_rows_onehot

    tab = jnp.asarray(np.linspace(0.1, 7.7, 64 * 13).reshape(64, 13),
                      jnp.float32)
    idx = jnp.arange(256, dtype=jnp.int32) % 64
    txt = jax.jit(_select_rows_onehot).lower(tab, idx).as_text()
    assert txt.count("stablehlo.dot") >= 3, "3-way split dots missing"
    assert txt.count("optimization_barrier") >= 3, (
        "anti-refold barriers missing: on TPU the three split dots "
        "collapse into one bf16 dot without them")


def test_ladder_descent_actually_removes_gathers(four_walls):
    """Non-vacuity guard: the ladder branch must actually be TAKEN.

    In rounds 1-3 ``use_ladder`` was dead code (the ``isinstance(base,
    int)`` staticness test ran after ``base`` had been converted to a
    jnp array), so the equality test above compared the gather path
    against itself and every ladder A/B measured 0 = 0. This test pins
    the lowered program shape so that regression cannot recur:
    ``ladder=0`` lowers to a rolled loop (a ``while`` op) issuing HBM
    gathers; ``ladder=k`` unrolls (no ``while``); ``ladder>=3`` engages
    the one-hot MXU path (``dot`` ops); a FULL ladder issues ZERO
    gather ops."""
    from madicp_tpu.ops.tree import search_forest

    pts = jnp.asarray(np.asarray(four_walls, float), jnp.float32)
    depth = 10  # n_gathers = 4; ladder=4 covers every level
    tree, _ = jax.jit(
        lambda p, v: build_tree(p, v, depth=depth, b_max=0.2, b_min=0.1)
    )(pts, jnp.ones(len(pts), bool))
    q = pts[:256]

    def lowered(ladder):
        return jax.jit(
            lambda nav, q: search_forest(
                nav, q, 0, depth, return_blocks=True, return_margin=True,
                ladder=ladder,
            )
        ).lower(tree.nav, q).as_text()

    t0 = lowered(0)
    assert t0.count("stablehlo.while") >= 1
    assert t0.count("stablehlo.gather") >= 1
    t3 = lowered(3)
    assert t3.count("stablehlo.while") == 0, "ladder trace must unroll"
    assert t3.count("stablehlo.dot") >= 3, "one-hot MXU selection absent"
    t4 = lowered(4)
    assert t4.count("stablehlo.gather") == 0, (
        "full ladder must issue no gather ops")


def test_pallas_segsum_moments_matches_scatter():
    """The (disabled-by-default) Pallas moment segment-sum must stay a
    correct drop-in for the scatter-add: same sums to f32-reassociation
    tolerance (sum ORDER differs by design), padding rows dropped.
    Runs the kernel in interpreter mode so the pin holds on the CPU
    suite; the chip-side numeric check lives in
    scripts/pallas_scatter_probe.py (r5)."""
    from madicp_tpu.ops.tree import _segsum_moments_pallas

    rng = np.random.default_rng(5)
    N, sz = 4096, 64
    d = rng.normal(0, 2.0, (N, 3)).astype(np.float32)
    idx = rng.integers(0, sz, N).astype(np.int32)
    idx[rng.random(N) < 0.1] = sz  # dropped rows

    got = np.asarray(
        _segsum_moments_pallas(
            jnp.asarray(d), jnp.asarray(idx), sz, interpret=True
        )
    )

    dd = d.astype(np.float64)
    mom = np.concatenate(
        [dd,
         dd[:, 0:1] * dd[:, 0:1], dd[:, 0:1] * dd[:, 1:2],
         dd[:, 0:1] * dd[:, 2:3], dd[:, 1:2] * dd[:, 1:2],
         dd[:, 1:2] * dd[:, 2:3], dd[:, 2:3] * dd[:, 2:3],
         np.ones((N, 1))], axis=1,
    )
    want = np.zeros((sz, 10))
    np.add.at(want, idx[idx < sz], mom[idx < sz])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=5e-3)

    # the shipped default stays OFF until the pallas layout wall falls
    # (NOTES r5: in-build relayout copies at the call boundary lose 2.3x)
    from madicp_tpu.ops.tree import _BUILD_PALLAS_SEGSUM_MAX

    import os
    if "MADICP_PALLAS_SEGSUM" not in os.environ:
        assert _BUILD_PALLAS_SEGSUM_MAX == 0
