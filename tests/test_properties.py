"""Property-based tests (hypothesis) for the pure kernels."""

from hypothesis import given, settings
from hypothesis import strategies as st

from fundamental_ray.crawl.canonicalize import canonicalize_url, host_of
from fundamental_ray.crawl.seen import CuckooFilter
from fundamental_ray.extraction.fields import normalize_dutch_date
from fundamental_ray.ops.dedup import jaccard, minhash_signature

url_part = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789-._", min_size=1, max_size=12
)


@st.composite
def urls(draw):
    host = ".".join(draw(st.lists(url_part, min_size=2, max_size=3)))
    path = "/".join(draw(st.lists(url_part, min_size=0, max_size=4)))
    q = "&".join(
        f"{draw(url_part)}={draw(url_part)}" for _ in range(draw(st.integers(0, 3)))
    )
    frag = draw(st.one_of(st.just(""), url_part))
    return f"https://{host}/{path}" + (f"?{q}" if q else "") + (f"#{frag}" if frag else "")


@given(urls())
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent_and_fragment_free(u):
    c = canonicalize_url(u)
    assert canonicalize_url(c) == c          # idempotent — safe to re-apply
    assert "#" not in c                       # fragments always stripped
    assert host_of(c) == host_of(u)           # host preserved (lowercased)


@given(st.lists(st.binary(min_size=1, max_size=40), min_size=1, max_size=300,
                unique=True))
@settings(max_examples=50, deadline=None)
def test_cuckoo_never_false_negative(keys):
    f = CuckooFilter(4096)
    inserted = [k for k in keys if f.insert(k)]
    assert all(f.contains(k) for k in inserted)


@given(st.integers(1, 28), st.integers(0, 11), st.integers(1990, 2030))
@settings(max_examples=100, deadline=None)
def test_dutch_date_all_months(day, month_idx, year):
    months = ["januari", "februari", "maart", "april", "mei", "juni", "juli",
              "augustus", "september", "oktober", "november", "december"]
    got = normalize_dutch_date(f"{day} {months[month_idx]} {year}")
    assert got == f"{year}-{month_idx + 1:02d}-{day:02d}"


@given(st.lists(st.sampled_from("abcdefgh"), min_size=4, max_size=40))
@settings(max_examples=100, deadline=None)
def test_minhash_identical_texts_agree(tokens):
    t = " ".join(tokens)
    assert (minhash_signature(t) == minhash_signature(t)).all()
    assert jaccard(t, t) == 1.0


@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-50, max_value=50, allow_nan=False, width=32),
            st.floats(min_value=-50, max_value=50, allow_nan=False, width=32),
        ),
        min_size=1, max_size=40,
    ),
    st.floats(min_value=1e-4, max_value=2.0, allow_nan=False),
)
@settings(deadline=None, max_examples=60)
def test_buffer_hull_invariants_random(points, radius):
    """Shapely round-join buffer invariants over arbitrary point clouds:
    CCW, convex, every input point at least `radius` inside the ring, and
    every ring vertex exactly `radius` from the hull."""
    import numpy as np

    from fundamental_ray.ops.geometry import buffer_hull, convex_hull

    pts = np.array(points, dtype=np.float64)
    h = convex_hull(pts)
    b = buffer_hull(h, radius)
    assert len(b) >= 3
    # CCW + convex
    e = np.roll(b, -1, axis=0) - b
    cross = e[:, 0] * np.roll(e, -1, axis=0)[:, 1] - e[:, 1] * np.roll(e, -1, axis=0)[:, 0]
    assert (cross >= -1e-9 * max(1.0, radius)).all()
    area = 0.5 * np.sum(b[:, 0] * np.roll(b[:, 1], -1) - np.roll(b[:, 0], -1) * b[:, 1])
    assert area > 0
    # every ring vertex sits exactly `radius` from the hull's vertex set or
    # edges; cheap sufficient check: distance to nearest hull VERTEX is in
    # [radius, radius + hull diameter] and min over ring == radius
    d = np.min(
        np.linalg.norm(b[:, None, :] - h[None, :, :], axis=2), axis=1
    )
    assert d.min() >= radius - 1e-9
    # every input point strictly inside the ring by >= radius - eps:
    # distance from each original point to every ring vertex >= radius - eps
    for p in pts:
        assert np.min(np.linalg.norm(b - p, axis=1)) >= radius - 1e-9
