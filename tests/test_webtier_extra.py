"""Extraction-tier round-5 additions: fenced code blocks, hreflang
clusters, microdata scoping, AMP reciprocity, link-rel governance."""

import pandas as pd

from tensorflow_ocr_ray.functions.html_extract import (
    amp_page_for,
    code_page_for,
    extract_amp_edge,
    extract_code_blocks,
    extract_hreflang,
    extract_microdata,
    extract_rel_links,
    hreflang_page_for,
    microdata_page_for,
    rel_link_page_for,
)

SF = "/root/testdata/sf0.001"


# -------------------------------------------------------- code blocks ----


def test_code_blocks_verbatim_and_decoys():
    for d in (0, 5, 11):
        blocks = extract_code_blocks(code_page_for(d))
        assert len(blocks) == 1 + d % 3
        for i, (lang, code) in enumerate(blocks):
            assert lang == ("python", "js", "sql", "c")[(d + i) % 4]
            lines = code.split("\n")
            assert len(lines) == 2 + (d + 2 * i) % 4
            for j, line in enumerate(lines):
                # verbatim newlines + entity unescape (&lt; -> <)
                assert line == "v%d_%d_%d = %d  # %d<9" % (
                    d, i, j, d * 3 + i * 5 + j, j)


def test_code_blocks_handcrafted_decoys():
    html = (
        "<body><p>inline <code>f(1)</code> text</p>"
        "<pre>no code child</pre>"
        "<script>s = '<pre><code>x</code></pre>';</script>"
        "<!-- <pre><code>y</code></pre> -->"
        "<pre><code>bare = 1\nbare = 2</code></pre></body>"
    )
    blocks = extract_code_blocks(html)
    assert blocks == [("txt", "bare = 1\nbare = 2")]


# ----------------------------------------------------------- hreflang ----


def test_hreflang_breakage_and_decoys():
    # member 2 of a g%5==0 cluster omits the en link; RSS/canonical
    # link decoys never parse as alternates
    assert len(extract_hreflang(hreflang_page_for(0))) == 3
    broken = extract_hreflang(hreflang_page_for(2))
    assert [la for la, _ in broken] == ["de", "fr"]
    full = extract_hreflang(hreflang_page_for(5))  # g=1, not broken
    assert [la for la, _ in full] == ["en", "de", "fr"]


def test_hreflang_clusters_pipeline(ray_session):
    from tensorflow_ocr_ray.pipelines.webtier import hreflang_clusters

    out = hreflang_clusters(SF)
    # 500 docs -> clusters 0..165 full, 166 has members {0, 1}
    assert len(out) == 167
    by = out.set_index("cluster_id")
    assert by.loc[166, "n_members"] == 2
    assert by.loc[166, "n_edges"] == 2
    assert by.loc[166, "reciprocal"] == 1
    # planted breakage in every g%5==0 full cluster
    broken = by[by.reciprocal == 0]
    assert set(broken.index) == {g for g in range(166) if g % 5 == 0}
    assert (broken.n_edges == 5).all()
    full = by[(by.reciprocal == 1) & (by.n_members == 3)]
    assert (full.n_edges == 6).all()


# ---------------------------------------------------------- microdata ----


def test_microdata_nested_scoping():
    items = extract_microdata(microdata_page_for(4))
    assert len(items) == 1
    prod = items[0]
    assert prod["type"] == "Product"
    assert prod["name"] == "P 4"          # Brand name did NOT leak
    assert prod["brand"] == "<Brand>"     # nested item marker
    assert prod["price"] == "128"
    art = extract_microdata(microdata_page_for(5))[0]
    assert art == {"type": "Article", "headline": "A 5",
                   "wordCount": "55"}


def test_microdata_handcrafted_two_levels():
    html = (
        '<div itemscope itemtype="https://schema.org/Product">'
        '<span itemprop="name">Outer</span>'
        '<div itemprop="offers" itemscope '
        'itemtype="https://schema.org/Offer">'
        '<meta itemprop="price" content="9 &amp; 9">'
        "</div>"
        '<meta itemprop="sku" content="S1">'
        "</div>"
    )
    items = extract_microdata(html)
    assert len(items) == 1
    it = items[0]
    # price belongs to the NESTED Offer, not the Product; sku (after
    # the nested item closed) is back on the Product
    assert it["name"] == "Outer" and it["offers"] == "<Offer>"
    assert "price" not in it and it["sku"] == "S1"


# ------------------------------------------------------------ AMP --------


def test_amp_edges_and_planted_breakage():
    assert extract_amp_edge(amp_page_for(0)) == ("canon", 0)
    assert extract_amp_edge(amp_page_for(2)) == ("canon", 1)
    assert extract_amp_edge(amp_page_for(3)) == ("amp", 1)
    # p=0 and p=7 are %7==0 -> re-keyed back-links
    assert extract_amp_edge(amp_page_for(1)) == ("amp", 1000000)
    assert extract_amp_edge(amp_page_for(15)) == ("amp", 1000007)


def test_amp_pairs_pipeline(ray_session):
    from tensorflow_ocr_ray.pipelines.webtier import amp_canonical_pairs

    out = amp_canonical_pairs(SF)
    # 250 real pairs + 36 phantom amp-only keys (p%7==0, p in 0..249)
    assert len(out) == 286
    by = out.set_index("pair_key")
    phantoms = by[by.index >= 1000000]
    assert len(phantoms) == 36
    assert (phantoms.has_canonical == 0).all()
    assert (phantoms.consistent == 0).all()
    stranded = by[(by.index < 1000000) & (by.has_amp == 0)]
    assert set(stranded.index) == {p for p in range(250) if p % 7 == 0}
    assert int(by.consistent.sum()) == 250 - 36


# ------------------------------------------------------- link rel ---------


def test_rel_links_token_list_and_relative_decoy():
    links = extract_rel_links(rel_link_page_for(3))
    # the rel="nofollow" RELATIVE nav link is not an outlink
    assert len(links) == 4
    # k=0: variant (9+0)%5=4 -> 'nofollow ugc' flags BOTH
    assert links[0] == ("host21.example", 1, 0, 1)
    assert links[1] == ("host22.example", 0, 0, 0)


def test_link_rel_audit_pipeline(ray_session):
    from tensorflow_ocr_ray.pipelines.webtier import link_rel_audit

    out = link_rel_audit(SF).set_index("host")
    assert len(out) == 50
    # every link lands in exactly one of follow/nofollow/sponsored/ugc
    # except the 'nofollow ugc' variant which double-counts nf+ugc:
    # n_follow + n_sponsored + n_nofollow + n_ugc - dup = n_links,
    # so the identity holds as >=
    assert (out.n_follow + out.n_nofollow + out.n_sponsored
            + out.n_ugc >= out.n_links).all()
    assert (out.n_links > 0).all()


# ------------------------------------------------------- breadcrumbs ------


def test_breadcrumb_decoy_and_path():
    from tensorflow_ocr_ray.functions.html_extract import (
        breadcrumb_page_for,
        extract_breadcrumb,
    )

    depth, path = extract_breadcrumb(breadcrumb_page_for(7))
    assert depth == 4 and path == "Home > C15 > C16 > Leaf 7"
    # a page with ONLY the pagination nav has no trail
    decoy_only = ('<nav><ol><li><a href="/p/1">1</a></li>'
                  "</ol></nav>")
    assert extract_breadcrumb(decoy_only) == (0, "")


# -------------------------------------------------------- OG audit --------


def test_og_card_audit_cases():
    from tensorflow_ocr_ray.functions.html_extract import (
        audit_og_card,
        og_page_for,
    )

    assert audit_og_card(og_page_for(6)) == (0, 0)   # stale + no image
    assert audit_og_card(og_page_for(4)) == (1, 1)
    assert audit_og_card(og_page_for(3)) == (1, 0)
    # twitter:title never consulted: no og:title at all -> mismatch
    assert audit_og_card(
        '<title>X</title><meta name="twitter:title" content="X">'
    ) == (0, 0)


# --------------------------------------------- extractor agreement --------


def test_extractor_agreement_planted_divergence():
    from tensorflow_ocr_ray.functions.html_extract import (
        agreement_page_for,
        extract_main_content,
        extract_main_content_density,
    )

    t = "Some long enough document text for the extractor here."
    page = agreement_page_for(8, t)
    a, b = extract_main_content(page), extract_main_content_density(page)
    assert a == t and b == t + "\ntiny 8"
    page = agreement_page_for(9, t)
    assert (extract_main_content(page)
            == extract_main_content_density(page) == t)


# ------------------------------------------------------------ PLD ---------


def test_registrable_domain_longest_match():
    from tensorflow_ocr_ray.functions.urlnorm import registrable_domain

    assert registrable_domain("a.d3.co.uk") == "d3.co.uk"
    assert registrable_domain("deep.x.d3.co.uk") == "d3.co.uk"
    assert registrable_domain("h1.d2.com") == "d2.com"
    # bare suffixes and unlisted TLDs are unattributable
    assert registrable_domain("co.uk") is None
    assert registrable_domain("uk") is None
    assert registrable_domain("host.example") is None


def test_domain_pld_rollup_pipeline(ray_session):
    from tensorflow_ocr_ray.pipelines.webtier import domain_pld_rollup

    out = domain_pld_rollup(SF).set_index("pld")
    # every pld is domain-label.suffix, never a bare suffix
    assert all("." in p and not p.startswith("co.") for p in out.index)
    # co.uk PLDs exist (the longest-match trap was exercised)
    assert any(p.endswith(".co.uk") for p in out.index)
    assert (out.n_urls >= out.n_hosts).all()
    # total urls = sum over docs of 1 + d%3
    assert int(out.n_urls.sum()) == sum(1 + d % 3 for d in range(500))


# ------------------------------------------------------ recrawl diff ------


def test_crawl_snapshot_arithmetic():
    from tensorflow_ocr_ray.functions.urlnorm import crawl_snapshot_for

    assert crawl_snapshot_for(11, 1) == []                      # gone
    assert crawl_snapshot_for(5, 1)[0][1] == 66                 # changed
    assert crawl_snapshot_for(9, 1)[1][0].endswith("/new")      # new
    # doc 0: base gone from t1? no — 0%11==0 means GONE, and 0%9==0
    # mints the /new URL, so t1 has only the new one
    t1 = crawl_snapshot_for(0, 1)
    assert len(t1) == 1 and t1[0][0].endswith("/new")


def test_recrawl_diff_pipeline(ray_session):
    from tensorflow_ocr_ray.pipelines.webtier import recrawl_diff

    out = recrawl_diff(SF)
    by = out.set_index("url")
    n = 500
    gone = {d for d in range(n) if d % 11 == 0}
    changed = {d for d in range(n) if d % 5 == 0 and d % 11 != 0}
    new = {d for d in range(n) if d % 9 == 0}
    assert (out.status == "gone").sum() == len(gone)
    assert (out.status == "changed").sum() == len(changed)
    assert (out.status == "new").sum() == len(new)
    assert (out.status == "unchanged").sum() == n - len(gone) - len(changed)
    row = by.loc["https://s5.example.com/p/5"]
    assert (row.status, row.h_prev, row.h_curr) == ("changed", 65, 66)
    row = by.loc["https://s0.example.com/p/0/new"]
    assert (row.status, row.h_prev, row.h_curr) == ("new", -1, 0)


# ---------------------------------------------------------- PDF Info ------


def test_pdf_info_escapes_hex_and_decoy():
    from tensorflow_ocr_ray.functions.pdfmeta import (
        extract_pdf_info,
        pdf_with_info_for,
    )

    # escaped parens in the title literal, hex author on d%3==0
    info = extract_pdf_info(pdf_with_info_for(3))
    assert info == {"title": "Doc 3 (v3)", "author": "A3",
                    "created_year": 2003}
    info = extract_pdf_info(pdf_with_info_for(7))
    assert info["title"] == "Doc 7 (v2)" and info["author"] == "A7"
    # no trailer / no Info -> typed empties
    assert extract_pdf_info(b"%PDF-1.4 nothing") == {
        "title": "", "author": "", "created_year": -1}
    # the content-stream /Title (decoy) never wins: strip the Info ref
    pdf = pdf_with_info_for(4).replace(b"/Info 5 0 R ", b"")
    assert extract_pdf_info(pdf)["title"] == ""


# ------------------------------------------------------- meta refresh -----


def test_meta_refresh_cases():
    from tensorflow_ocr_ray.functions.html_extract import (
        extract_meta_refresh,
        refresh_page_for,
    )

    assert extract_meta_refresh(refresh_page_for(3)) == (
        3, "https://r.example.com/t/33")
    assert extract_meta_refresh(refresh_page_for(9)) is None   # bare delay
    assert extract_meta_refresh(refresh_page_for(1)) is None   # decoy only
    # quoted url form and uppercase directive
    assert extract_meta_refresh(
        '<meta http-equiv="REFRESH" content="0;URL=\'https://x.ex/p\'">'
    ) == (0, "https://x.ex/p")


# ---------------------------------------------------- robots sitemaps -----


def test_robots_sitemap_lines():
    from tensorflow_ocr_ray.functions.feeds import (
        parse_robots_sitemaps,
        robots_txt_for,
    )

    urls = parse_robots_sitemaps(robots_txt_for(5))
    assert urls == ["https://site5.example.com/sitemap%d.xml" % j
                    for j in range(3)]
    # the commented-out line never parses
    assert not any("old.xml" in u for u in urls)
    assert parse_robots_sitemaps("User-agent: *\nDisallow: /\n") == []


# ------------------------------------------------------ HTTP response -----


def test_http_response_parse_cases():
    from tensorflow_ocr_ray.functions.warc import (
        http_response_for,
        parse_http_response,
    )

    assert parse_http_response(http_response_for(2)) == (
        200, "text/html", "")
    assert parse_http_response(http_response_for(7)) == (
        301, "text/html", "https://s0.example.com/moved/7")
    # 404 wins on d % 91 == 0 (both rules hit)
    assert parse_http_response(http_response_for(91))[0] == 404
    # mime token cut before params, X-Decoy-Location never matches
    s, ct, loc = parse_http_response(http_response_for(4))
    assert ct == "application/pdf" and loc == ""


# ----------------------------------------------------- section chunks -----


def test_section_chunks_breadcrumbs_and_bodies():
    from tensorflow_ocr_ray.functions.html_extract import (
        extract_section_chunks,
        outline_page_for,
    )

    rows = extract_section_chunks(outline_page_for(5))
    # 1 h1 + 3 h2 + 3*2 h3 = 10 chunks
    assert len(rows) == 10
    assert rows[0] == (0, 1, "H1 5", "")
    assert rows[1] == (1, 2, "H1 5 > S 5 0", "sec body")
    assert rows[2] == (2, 3, "H1 5 > S 5 0 > T 5 0 0", "sub")
    # the breadcrumb resets at the next h2
    assert rows[4] == (4, 2, "H1 5 > S 5 1", "sec body")
    # comment/script heading decoys never produce a chunk
    assert not any("fake" in p or "commented" in p for _, _, p, _ in rows)


# ------------------------------------------------------ bitext mining -----


def test_bitext_margin_mine_vs_dense_rederivation(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from tensorflow_ocr_ray.pipelines.similarity import bitext_margin_mine

    out = bitext_margin_mine(SF).set_index("src_id")

    # independent dense re-derivation (full sim matrix, no blocking)
    t = pq.read_table(SF + "/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    m = np.stack([np.asarray(v, dtype=np.float64)
                  for v in t.column("embedding").to_pylist()])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    src, tgt = ids[ids % 2 == 0], ids[ids % 2 == 1]
    S = m[ids % 2 == 0] @ m[ids % 2 == 1].T
    k = 4
    fwd = np.mean(np.sort(S, axis=1)[:, -k:], axis=1)
    bwd = np.mean(np.sort(S, axis=0)[-k:, :], axis=0)
    margin = S / ((fwd[:, None] + bwd[None, :]) / 2.0)
    best = np.argmax(margin, axis=1)
    assert len(out) == len(src)
    for i, x in enumerate(src):
        row = out.loc[int(x)]
        assert int(row.dst_id) == int(tgt[best[i]])
        assert abs(row.margin - margin[i, best[i]]) < 5e-4
        assert int(row.accepted) == int(margin[i, best[i]] > 1.02)


def test_embedding_outlier_audit_vs_dense(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from tensorflow_ocr_ray.pipelines.similarity import (
        embedding_outlier_audit,
    )

    out = embedding_outlier_audit(SF).set_index("label")
    t = pq.read_table(SF + "/embeddings.parquet")
    ids = t.column("vec_id").to_numpy()
    labs = t.column("label").to_numpy()
    m = np.stack([np.asarray(v, dtype=np.float64)
                  for v in t.column("embedding").to_pylist()])
    for lab in np.unique(labs):
        sel = labs == lab
        d2 = ((m[sel] - m[sel].mean(axis=0)[None, :]) ** 2).sum(axis=1)
        row = out.loc[int(lab)]
        assert int(row.n) == int(sel.sum())
        assert abs(row.mean_dist2 - d2.mean()) < 5e-4
        assert abs(row.max_dist2 - d2.max()) < 5e-4
        top = int(np.lexsort((ids[sel], -d2))[0])
        assert int(row.outlier_vec_id) == int(ids[sel][top])


# ---------------- video embeds / canonical / forms / JS audit --------------


def test_video_embed_decoys_and_order():
    from tensorflow_ocr_ray.functions.html_extract import (
        embed_page_for,
        extract_video_embeds,
    )

    # d=0: only the ad iframe + commented-out embed -> nothing
    assert extract_video_embeds(embed_page_for(0)) == []
    # d=2: selfhost (kind (2+0)%3=2) then videotube ((2+1)%3=0),
    # ids 14,15, in document order
    assert extract_video_embeds(embed_page_for(2)) == [
        (0, "selfhost", 14), (1, "videotube", 15)]
    # the decoy hosts never leak
    for d in range(30):
        for _, prov, vid in extract_video_embeds(embed_page_for(d)):
            assert prov in ("videotube", "vidmeo", "selfhost")
            assert vid != 999


def test_canonical_audit_rules():
    from tensorflow_ocr_ray.functions.html_extract import (
        audit_canonical,
        canonical_page_for,
    )

    assert audit_canonical(canonical_page_for(7)) == (0, 1, 0)   # missing
    assert audit_canonical(canonical_page_for(10)) == (1, 1, 0)  # stale og
    assert audit_canonical(canonical_page_for(11)) == (1, 1, 1)  # clean
    # alternate-link decoy never counts as canonical
    html = canonical_page_for(7)
    assert 'rel="alternate"' in html


def test_form_extract_commented_decoy():
    from tensorflow_ocr_ray.functions.html_extract import (
        extract_forms,
        form_page_for,
    )

    # d=1: only the search form; the commented-out password form must
    # not set has_login
    assert extract_forms(form_page_for(1)) == (1, 0, 1, 0, 0)
    # d=12: search + login + subscribe
    assert extract_forms(form_page_for(12)) == (3, 2, 5, 1, 1)


def test_js_dependence_shell_vs_content():
    from tensorflow_ocr_ray.functions.html_extract import (
        audit_js_dependence,
        jsheavy_page_for,
    )

    text = "a" * 50
    assert audit_js_dependence(jsheavy_page_for(6, text)) == (
        0, 100 + 6 % 10 * 17, 1)
    assert audit_js_dependence(jsheavy_page_for(1, text)) == (50, 30, 0)


def test_readability_counts_match_fixture_arithmetic():
    from tensorflow_ocr_ray.functions.textstats import (
        _READ_SYL,
        readability_counts,
        readable_text_for,
    )

    for d in range(40):
        ns = d % 4 + 2
        words = sum(3 + (d + s) % 5 for s in range(ns))
        syl = sum(_READ_SYL[(d * 7 + s * 3 + w) % 8]
                  for s in range(ns)
                  for w in range(3 + (d + s) % 5))
        s_got, w_got, y_got, fl = readability_counts(
            readable_text_for(d))
        assert (s_got, w_got, y_got) == (ns, words, syl)
        assert fl == (206.835 - 1.015 * (words / ns)
                      - 84.6 * (syl / words))


def test_quality_lr_features_hand_example():
    from tensorflow_ocr_ray.functions.textstats import quality_lr_features

    t = "the fast the fast key"
    tok, mw, st, di, score, passed = quality_lr_features(t)
    assert tok == 5
    assert mw == (len(t) - 4) * 1000 // 5        # mean word len milli
    assert st == 2 * 1000 // 5                   # two 'the'
    assert di == 3 * 1000 // 5                   # the/fast/key
    assert score == 2 * 5 + mw + di - 2 * st
    assert passed == int(score >= 5000)


def test_vtt_decoys_and_ms_math():
    from tensorflow_ocr_ray.functions.feeds import parse_vtt, vtt_for

    cues = parse_vtt(vtt_for(3))
    assert [c[0] for c in cues] == [0, 1, 2, 3]
    assert cues[0][1:] == (3000, 5000, "S0", "cue 3 0")
    assert cues[1][3] == ""          # odd cue: no voice tag
    # NOTE/STYLE blocks never parse as cues
    assert all("NOTE" not in c[4] and "::cue" not in c[4]
               for c in cues)
    # an hour-scale timestamp roundtrips exactly
    big = parse_vtt(vtt_for(4000))
    assert big[0][1] == 4000 * 1000


def test_cache_policy_buckets():
    from tensorflow_ocr_ray.functions.warc import (
        cache_head_for,
        parse_cache_head,
    )

    assert parse_cache_head(cache_head_for(11))[3] == "no-store"
    assert parse_cache_head(cache_head_for(1)) == (600, 0, 1, "fresh")
    assert parse_cache_head(cache_head_for(14))[3] == "etag-only"
    assert parse_cache_head(cache_head_for(35))[3] == "unvalidated"
    # the X-Cache-Decoy header's max-age never leaks
    assert parse_cache_head(cache_head_for(1))[0] != 99999


def test_mime_decodes_and_framing_decoys():
    from tensorflow_ocr_ray.functions.warc import mime_for, parse_mime

    parts = parse_mime(mime_for(2))
    assert len(parts) == 3
    # every payload decoded back to the exact planted text, = escape
    # round-tripped through both encodings
    for i, ct, enc, text in parts:
        assert text == "mime 2 part %d =ok" % i
        assert enc == ("base64" if i % 2 == 0 else "quoted-printable")
    # preamble/epilogue never leak into parts
    assert all("preamble" not in t and "Epilogue" not in t
               for _, _, _, t in parts)


def test_price_decoys_never_match():
    from tensorflow_ocr_ray.functions.textstats import (
        extract_prices,
        price_text_for,
    )

    for d in range(20):
        vals = extract_prices(price_text_for(d))
        assert len(vals) == d % 3 + 1
        for k, cur, v in vals:
            assert v == (d * 1000 + k * 777) % 1000000 + 1
            assert cur == ("USD" if (d + k) % 2 == 0 else "EUR")
    # the 3.5 and 1,999 decoys alone yield nothing
    assert extract_prices("pay 3.5 units since 1,999 thanks") == []


def test_anchor_and_alt_edge_docs():
    from tensorflow_ocr_ray.functions.html_extract import (
        audit_anchors,
        audit_img_alt,
        img_page_for,
        toc_page_for,
    )

    # d=1: no broken link, all anchors resolve
    assert audit_anchors(toc_page_for(1)) == (3, 3, 0)
    # d=0: the #missing link is broken; ext decoy not counted
    n_a, n_t, n_b = audit_anchors(toc_page_for(0))
    assert (n_a, n_b) == (3, 1)
    # commented-out img never counted
    n, miss, emp, cov = audit_img_alt(img_page_for(4))
    assert n == 4 % 5 + 1
