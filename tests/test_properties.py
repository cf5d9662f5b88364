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
