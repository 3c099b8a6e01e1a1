"""Real-shaped HTML page snapshots for the html_main_text fixture
battery (VERDICT r9 item 5).

The r9 extractor A/B ran on synthetic chrome only (one nav + one
footer template); this corpus hand-models the layouts a Common Crawl
sample actually contains — div-soup navigation, breadcrumbs, bylines,
pull quotes, related-article rails, comment sections, cookie banners,
paywall teasers, e-commerce spec sheets, documentation code blocks,
forum threads, mega-footers, CJK/RTL prose, malformed markup, and the
r11 adversarial set (nested tables-as-layout, AMP custom elements,
dialog/aside cookie banners with inline styles, mixed RTL+CJK) — with
per-page KEEP/DROP sentinels derived from the classifier's documented
contract (tag subtrees + link density + 80-char prose + near-good
cascades), NOT from what the implementation happens to do.

Each page is a dict:
  name        — layout id
  html        — the snapshot (str)
  must_keep   — substrings that MUST appear in html_main_text output
  must_drop   — substrings that MUST NOT appear
  known_miss  — substrings the current classifier handles WRONG by
                design (kept boilerplate / dropped content); asserted
                at their CURRENT behavior so a silent change is loud,
                and documented as the honest trade in SCALING.md.

`variants(n)` replicates every layout with page-unique prose so
corpus-level cards (boilerplate_card, extraction_compare_card) see a
measurement-sized crawl where the only cross-doc repeated lines are
genuine chrome.
"""

from __future__ import annotations

_LOREM = ("The committee reviewed the updated measurements and found "
          "the proposed methodology sound in every tested regime, "
          "noting that the calibration step removed the residual bias "
          "the earlier survey had documented across instruments. ")


def _para(tag: str, i: int, extra: str = "") -> str:
    # >= 80 normalised chars of page-unique prose => a "good" block
    return (f"<{tag}>{_LOREM}Finding {i}: sentinel-{tag}-{i} {extra}"
            f"</{tag}>")


def _news(uid: str) -> dict:
    html = f"""<html><head><title>City council vote {uid}</title>
<script>var t=1;</script><style>p{{margin:0}}</style></head><body>
<header><div><a href="/">Home</a> <a href="/news">News</a>
<a href="/sport">Sport</a> <a href="/weather">Weather</a></div></header>
<div class="breadcrumbs"><a href="/">Home</a> &gt;
<a href="/news">News</a> &gt; <a href="/news/local">Local</a></div>
<main><h1>Council approves the riverside plan {uid}</h1>
<div class="byline">By A. Reporter, Staff Writer ({uid})</div>
{_para("p", 1, f"riverside-{uid}")}
{_para("p", 2, f"riverside-{uid}")}
<blockquote>"A short pull quote {uid}."</blockquote>
{_para("p", 3, f"riverside-{uid}")}
<div class="related"><a href="/a1">Related: the 2019 flood report</a>
<a href="/a2">Related: budget vote delayed</a>
<a href="/a3">Related: mayor interview</a></div>
<div class="comments">
<div class="comment">{_LOREM}First commenter adds context about the
downstream reach and asks how the plan treats the old mill race
comment-{uid}.</div></div></main>
<footer><a href="/privacy">Privacy Policy</a>
<a href="/tos">Terms of Use</a> All rights reserved</footer>
</body></html>"""
    return {
        "name": "news_article", "html": html,
        # title + byline + pull quote ride the near-good cascades
        "must_keep": [f"riverside plan {uid}", "By A. Reporter",
                      "A short pull quote", f"sentinel-p-1",
                      f"sentinel-p-3"],
        "must_drop": ["Home", "Local", "Related: the 2019",
                      "Privacy Policy", "All rights reserved"],
        # long low-link comment prose is kept — the documented jusText
        # behavior (comments ARE prose to a tag+density classifier)
        "known_miss": {"kept": [f"comment-{uid}"], "dropped": []},
    }


def _blog(uid: str) -> dict:
    html = f"""<html><body>
<nav><a href="/">blog home</a> <a href="/archive">archive</a></nav>
<aside>{_LOREM}About the author: a long biography that sits in an
aside element and must be dropped by subtree whatever its length
bio-{uid}.</aside>
<article><h2>Why we rewrote the pipeline {uid}</h2>
{_para("p", 1, f"rewrite-{uid}")}
<p>Short transition line {uid}.</p>
{_para("p", 2, f"rewrite-{uid}")}</article>
<form><label>Subscribe to the newsletter</label>
<input type="email"/><button>Sign up</button></form>
<footer>© example.org</footer></body></html>"""
    return {
        "name": "blog_post", "html": html,
        "must_keep": [f"rewrote the pipeline {uid}", "sentinel-p-1",
                      "Short transition line", "sentinel-p-2"],
        "must_drop": [f"bio-{uid}", "blog home",
                      "Subscribe to the newsletter", "© example.org"],
        "known_miss": {"kept": [], "dropped": []},
    }


def _ecommerce(uid: str) -> dict:
    html = f"""<html><body>
<header><a href="/">Shop</a> <a href="/cart">Cart (0)</a></header>
<h1>Thermal Carafe 1.5L {uid}</h1>
<div class="price">$39.99 - item {uid}</div>
<div class="description">{_LOREM}This carafe keeps drinks hot for
twelve hours and cold for twenty-four, with a brushed steel body
desc-{uid}.</div>
<ul><li>Capacity: 1.5 litres ({uid})</li><li>Weight: 62{uid} g</li>
<li>Dishwasher safe: no ({uid})</li></ul>
<div class="reviews">{_LOREM}Reviewer writes that the lid seal
survived a year of daily use and the pour stays drip-free
review-{uid}.</div>
<footer><a href="/returns">Returns</a> <a href="/help">Help</a>
<a href="/stores">Stores</a></footer></body></html>"""
    return {
        "name": "ecommerce_product", "html": html,
        # h1/price/specs cascade off the good description block
        "must_keep": [f"Thermal Carafe 1.5L {uid}", "$39.99",
                      f"desc-{uid}", "Capacity: 1.5 litres",
                      f"review-{uid}"],
        "must_drop": ["Cart (0)", "Returns"],
        "known_miss": {"kept": [], "dropped": []},
    }


def _docs(uid: str) -> dict:
    html = f"""<html><body>
<nav><a href="/api">API</a> <a href="/guides">Guides</a></nav>
<main><h2>Configuring retries {uid}</h2>
{_para("p", 1, f"retries-{uid}")}
<pre>client.configure(retries=3)  # svc-{uid}</pre>
<pre>client.request(timeout_s=30)  # svc-{uid}</pre>
{_para("p", 2, f"retries-{uid}")}</main>
<footer><a href="/v1">v1</a> <a href="/v2">v2</a></footer>
</body></html>"""
    return {
        "name": "docs_page", "html": html,
        # short code blocks sit between good paragraphs -> cascaded in
        "must_keep": [f"Configuring retries {uid}", "sentinel-p-1",
                      "client.configure(retries=3)",
                      "client.request(timeout_s=30)", "sentinel-p-2"],
        "must_drop": ["API", "Guides"],
        "known_miss": {"kept": [], "dropped": []},
    }


def _forum(uid: str) -> dict:
    html = f"""<html><body>
<div class="nav"><a href="/f">Forums</a> <a href="/u">Users</a>
<a href="/login">Log in</a></div>
<div class="post">{_LOREM}Original poster describes the failure mode
they hit when the cache exceeded its shard budget post1-{uid}.</div>
<div class="sig">-- sent from my terminal</div>
<div class="post">{_LOREM}A second user replies with the workaround
they shipped and links the patch in prose post2-{uid}.</div>
<div class="pagination"><a href="?p=1">1</a> <a href="?p=2">2</a>
<a href="?p=3">3</a> <a href="?p=2">Next page</a></div></body></html>"""
    return {
        "name": "forum_thread", "html": html,
        "must_keep": [f"post1-{uid}", f"post2-{uid}"],
        "must_drop": ["Forums", "Next page"],
        # the signature line rides the forward cascade off post1 —
        # documented over-keep (adjacent-short rescue is the rule that
        # saves captions; signatures are its cost)
        "known_miss": {"kept": ["sent from my terminal"], "dropped": []},
    }


def _link_farm(uid: str) -> dict:
    links = " ".join(f'<a href="/{uid}/{k}">keyword {uid} {k}</a>'
                     for k in range(40))
    html = f"<html><body><div>{links}</div></body></html>"
    return {
        "name": "link_farm", "html": html,
        "must_keep": [], "must_drop": [f"keyword {uid} 3"],
        "known_miss": {"kept": [], "dropped": []},
        "expect_empty": True,
    }


def _spa_shell(uid: str) -> dict:
    html = f"""<html><body><div id="root"></div>
<noscript>This application requires JavaScript {uid}.</noscript>
<script>window.__DATA__={{"page":"{uid}"}};</script></body></html>"""
    return {
        "name": "spa_shell", "html": html,
        "must_keep": [], "must_drop": ["requires JavaScript",
                                       "__DATA__"],
        "known_miss": {"kept": [], "dropped": []},
        "expect_empty": True,
    }


def _cookie_banner(uid: str) -> dict:
    html = f"""<html><body>
<div class="cookie-consent">We use cookies to personalise content and
ads, to provide social media features and to analyse our traffic. You
consent to our cookies if you continue to use our website.</div>
<article>{_para("p", 1, f"story-{uid}")}
{_para("p", 2, f"story-{uid}")}</article></body></html>"""
    return {
        "name": "cookie_banner_div", "html": html,
        "must_keep": ["sentinel-p-1", "sentinel-p-2"],
        "must_drop": [],
        # a long low-link cookie paragraph in a bare div IS prose to a
        # tag+density classifier — the false-keep class the
        # boilerplate_card keyword lexicon exists to catch corpus-side
        "known_miss": {"kept": ["We use cookies to personalise"],
                       "dropped": []},
    }


def _paywall(uid: str) -> dict:
    html = f"""<html><body>
<article>{_para("p", 1, f"teaser-{uid}")}
<div class="paywall">Subscribe to continue reading.</div></article>
<footer><a href="/subs">Subscriptions</a></footer></body></html>"""
    return {
        "name": "paywall_teaser", "html": html,
        "must_keep": ["sentinel-p-1"],
        "must_drop": ["Subscriptions"],
        # the paywall prompt rides the forward cascade off the teaser
        "known_miss": {"kept": ["Subscribe to continue reading"],
                       "dropped": []},
    }


def _cjk(uid: str) -> dict:
    # 90+ CJK chars clears any gate like latin prose; the SHORT one
    # (a full sentence in Chinese) is isolated behind a link-dense
    # block, so the near-good cascade cannot rescue it — it survives
    # via the CJK-dominant length gate (MAIN_MIN_BLOCK_CHARS_CJK,
    # r11; it was the documented latin-centric length-bias miss
    # through r10, kept share 0.488)
    long_zh = ("委员会审查了更新后的测量结果，认为所提出的方法在所有测试"
               "制度下都是可靠的，并指出校准步骤消除了早期调查记录的残余"
               "偏差，这一结论与国际同行的复核意见一致。" f"长文-{uid}。")
    short_zh = f"这是一个完整但简短的中文句子。短文-{uid}。"
    html = (f"<html><body><nav><a href='/'>首页</a></nav>"
            f"<p>{long_zh}</p>"
            f"<div><a href='/a'>更多</a> <a href='/b'>档案</a></div>"
            f"<p>{short_zh}</p></body></html>")
    return {
        "name": "cjk_page", "html": html,
        "must_keep": [f"长文-{uid}", f"短文-{uid}"],
        "must_drop": ["首页"],
        "known_miss": {"kept": [], "dropped": []},
    }


def _rtl(uid: str) -> dict:
    long_ar = ("راجعت اللجنة القياسات المحدثة ووجدت أن المنهجية "
               "المقترحة سليمة في جميع الأنظمة المختبرة، مشيرة إلى أن "
               "خطوة المعايرة أزالت الانحياز المتبقي الذي وثقه المسح "
               f"السابق عبر الأجهزة. نص-{uid}.")
    html = (f"<html><body dir='rtl'><header><a href='/'>الرئيسية</a>"
            f"</header><p>{long_ar}</p></body></html>")
    return {
        "name": "rtl_page", "html": html,
        "must_keep": [f"نص-{uid}"], "must_drop": ["الرئيسية"],
        "known_miss": {"kept": [], "dropped": []},
    }


def _table_page(uid: str) -> dict:
    rows = "".join(f"<tr><td>station {k} s{uid}</td><td>{k * 7}</td></tr>"
                   for k in range(6))
    html = f"""<html><body>
{_para("p", 1, f"stations-{uid}")}
<table><thead><tr><th>Station</th><th>Count</th></tr></thead>
<tbody>{rows}</tbody></table>
<div>{'<a href="/s">more tables</a> ' * 5}</div></body></html>"""
    return {
        "name": "table_page", "html": html,
        # header + first rows cascade off the intro paragraph
        "must_keep": ["sentinel-p-1", "station 0"],
        "must_drop": ["more tables"],
        "known_miss": {"kept": [], "dropped": []},
    }


def _mega_footer(uid: str) -> dict:
    cols = "".join("<div>" + " ".join(
        f'<a href="/x{c}{k}">Link {c}-{k}</a>' for k in range(8))
        + "</div>" for c in range(4))
    html = f"""<html><body>
<article>{_para("p", 1, f"body-{uid}")}</article>
<div class="mega-footer">{cols}</div></body></html>"""
    return {
        "name": "mega_footer_divs", "html": html,
        "must_keep": ["sentinel-p-1"], "must_drop": ["Link 2-3"],
        "known_miss": {"kept": [], "dropped": []},
    }


def _inline_links(uid: str) -> dict:
    html = f"""<html><body><p>{_LOREM}The survey cites
<a href="/r1">the 2021 replication</a> and
<a href="/r2">a follow-up</a> inline without tipping the block over
the link-density gate cites-{uid}.</p></body></html>"""
    return {
        "name": "inline_links_prose", "html": html,
        "must_keep": [f"cites-{uid}", "the 2021 replication"],
        "must_drop": [],
        "known_miss": {"kept": [], "dropped": []},
    }


def _malformed(uid: str) -> dict:
    # unclosed tags, stray </div>, attribute soup — HTMLParser must
    # keep segmenting without raising
    html = f"""<html><body></div><div class="x" data-a='1' data-b=2>
<p>{_LOREM}Malformed markup still yields the prose mal-{uid}.
<p>{_LOREM}Second paragraph never closed either mal2-{uid}.
<nav><a href="/">home</a></body></html>"""
    return {
        "name": "malformed_markup", "html": html,
        "must_keep": [f"mal-{uid}", f"mal2-{uid}"],
        "must_drop": ["home"],
        "known_miss": {"kept": [], "dropped": []},
    }


# --- r11 adversarial layouts (VERDICT r10 item 7): the classes the
# first 15 layouts don't cover — tables-as-layout, AMP, dialog/aside
# cookie banners with inline styles, mixed RTL+CJK.

def _nested_tables(uid: str) -> dict:
    # 1990s tables-as-layout: nav/sidebar/content are sibling <td>s of
    # one nested table. td/tr are block tags, so each cell segments;
    # the nav and sidebar cells are link-dense, the content cell is
    # prose, and the stray "best viewed" cell is a short adjacent only
    # to link chrome (no good neighbour => dies without a special case)
    nav = " ".join(f'<a href="/n{k}">Section {k}</a>' for k in range(6))
    side = " ".join(f'<a href="/s{k}">Hot link {k}</a>' for k in range(5))
    html = f"""<html><body><table border=0><tr>
<td width=150>{nav}</td>
<td><table><tr><td><h1>Weekly bulletin {uid}</h1>
{_para("p", 1, f"bulletin-{uid}")}</td></tr>
<tr><td>{_para("p", 2, f"bulletin-{uid}")}</td></tr></table></td>
<td width=120>{side}</td></tr>
<tr><td colspan=3>Best viewed in 800x600</td></tr></table>
</body></html>"""
    return {
        "name": "nested_tables", "html": html,
        "must_keep": ["sentinel-p-1", "sentinel-p-2"],
        "must_drop": ["Section 2", "Hot link 1", "Best viewed"],
        "known_miss": {"kept": [], "dropped": []},
    }


def _amp(uid: str) -> dict:
    # AMP page: <style amp-custom> carries a large inline stylesheet
    # (must never leak — style subtrees are suppressed), amp-img is a
    # text-free custom element, and the menu lives in <amp-sidebar> —
    # an unknown tag, so its link run lands in the surrounding block
    # and dies on link density, not on a tag whitelist
    css = ".x{margin:0} .amp-css-sentinel{color:red} " * 20
    html = f"""<html amp><head>
<style amp-custom>{css}</style></head><body>
<amp-sidebar id="m" layout="nodisplay">
<a href="/">AMP Menu Home</a> <a href="/b">AMP Menu B</a>
<a href="/c">AMP Menu C</a></amp-sidebar>
<h1>Measurement methods {uid}</h1>
{_para("p", 1, f"amp-{uid}")}
<amp-img src="/i.jpg" width=600 height=400></amp-img>
{_para("p", 2, f"amp-{uid}")}</body></html>"""
    return {
        "name": "amp_page", "html": html,
        "must_keep": ["sentinel-p-1", "sentinel-p-2",
                      f"Measurement methods {uid}"],
        "must_drop": ["AMP Menu B"],
        # invisible by construction (style subtree): BOTH faces must
        # suppress it — it is not "chrome the classifier drops", so it
        # is exempt from the lossless-block-face check
        "invisible_drop": ["amp-css-sentinel"],
        "known_miss": {"kept": [], "dropped": []},
    }


def _dialog_banner(uid: str) -> dict:
    # consent UI split across a <dialog> (NOT a chrome subtree — its
    # long low-link cookie paragraph is prose to a tag+density
    # classifier, the cookie_banner_div false-keep class on a new
    # host tag) and an <aside> (IS a chrome subtree => dropped even
    # with inline styles). Defense-in-depth: the dialog text hits the
    # boilerplate_card keyword lexicon corpus-side.
    html = f"""<html><body>
<dialog open style="position:fixed;bottom:0;background:#fff">
We use cookies and similar technologies to measure audiences and to
improve the experience; by continuing you accept the placement of
these cookies on your device. <a href="/accept">Accept</a></dialog>
<aside style="border:1px solid" class="consent-note">Manage consent
preferences anytime from the privacy settings panel.</aside>
<article>{_para("p", 1, f"feature-{uid}")}
{_para("p", 2, f"feature-{uid}")}</article></body></html>"""
    return {
        "name": "dialog_banner", "html": html,
        "must_keep": ["sentinel-p-1", "sentinel-p-2"],
        "must_drop": ["Manage consent"],
        "known_miss": {"kept": ["We use cookies and similar"],
                       "dropped": []},
    }


def _rtl_cjk_mixed(uid: str) -> dict:
    # mixed-script page: long Arabic + long Japanese prose both clear
    # their gates; the ISOLATED short Japanese sentence survives via
    # the CJK-dominant gate (r11); the isolated short Arabic sentence
    # still dies under the 80-char gate — Arabic is space-delimited
    # like latin, so the CJK information-density rationale does not
    # transfer; documented as the honest residual miss class
    long_ar = ("راجعت اللجنة القياسات المحدثة ووجدت أن المنهجية "
               "المقترحة سليمة في جميع الأنظمة المختبرة، مشيرة إلى أن "
               "خطوة المعايرة أزالت الانحياز المتبقي الذي وثقه المسح "
               f"السابق عبر الأجهزة. نص-م-{uid}.")
    long_ja = ("委員会は更新された測定結果を検討し、提案された手法が全ての"
               "試験条件で妥当であると判断した。較正手順により以前の調査で"
               f"記録された残差バイアスが除去されたことも確認された。長文J-{uid}。")
    short_ja = f"これは短い完全な日本語の文です。短文J-{uid}。"
    short_ar = f"جملة قصيرة كاملة. نص-ق-{uid}."
    html = (f"<html><body dir='rtl'><nav><a href='/'>القائمة</a> "
            f"<a href='/m'>メニュー</a></nav>"
            f"<p>{long_ar}</p><p lang='ja'>{long_ja}</p>"
            f"<div><a href='/a'>أرشيف</a> <a href='/b'>更多</a></div>"
            f"<p lang='ja'>{short_ja}</p>"
            f"<div><a href='/c'>المزيد</a> <a href='/d'>档案</a></div>"
            f"<p>{short_ar}</p></body></html>")
    return {
        "name": "rtl_cjk_mixed", "html": html,
        "must_keep": [f"نص-م-{uid}", f"長文J-{uid}", f"短文J-{uid}"],
        "must_drop": ["القائمة", "メニュー"],
        "known_miss": {"kept": [], "dropped": [f"نص-ق-{uid}"]},
    }


_LAYOUTS = [_news, _blog, _ecommerce, _docs, _forum, _link_farm,
            _spa_shell, _cookie_banner, _paywall, _cjk, _rtl,
            _table_page, _mega_footer, _inline_links, _malformed,
            _nested_tables, _amp, _dialog_banner, _rtl_cjk_mixed]


def pages() -> list[dict]:
    """One snapshot per layout (uid '0') — the assertion battery."""
    return [f("0") for f in _LAYOUTS]


def variants(n_per_layout: int = 7) -> list[dict]:
    """n variants of every layout with page-unique prose — the
    measurement corpus (default 7 x 19 = 133 pages). Deterministic:
    uid is the variant index."""
    return [f(str(v)) for v in range(n_per_layout) for f in _LAYOUTS]
