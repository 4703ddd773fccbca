#!/usr/bin/env python3
"""Golden-fixture generator for the extraction core's byte-parity tests.

Uses ONLY the Python stdlib pieces the reference builds on (html.unescape,
html.parser.HTMLParser, json) to produce expected outputs for a corpus of
tricky inputs. The get_text oracle below emulates what
BeautifulSoup(html, "html.parser").get_text(separator, strip=True) observably
does for bs4 >= 4.9: adjacent data chunks merge into one string; comments,
declarations, PIs and script/style bodies are excluded; entity references in
text and attribute values are decoded by html.parser (convert_charrefs=True).

Output: src/test/resources/graft/goldens/*.tsv with \\u-escaped fields so the
files stay diff-friendly.
"""
import html as html_lib
import json
import os
from html.parser import HTMLParser

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "graft", "goldens")


class TextOracle(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.parts = []
        self.buf = []
        self.container = None  # inside script/style cdata

    def _flush(self):
        if self.buf:
            self.parts.append("".join(self.buf))
            self.buf = []

    def handle_starttag(self, tag, attrs):
        self._flush()
        if tag in ("script", "style"):
            self.container = tag

    def handle_endtag(self, tag):
        self._flush()
        if tag in ("script", "style") and self.container == tag:
            self.container = None

    def handle_data(self, d):
        if self.container:
            return
        self.buf.append(d)

    def handle_comment(self, d): self._flush()
    def handle_decl(self, d): self._flush()
    def handle_pi(self, d): self._flush()
    def unknown_decl(self, d): self._flush()


def get_text(src, sep=" ", strip=True):
    p = TextOracle()
    p.feed(src)
    p.close()
    p._flush()
    parts = p.parts
    if strip:
        parts = [s.strip() for s in parts]
        parts = [s for s in parts if s]
    return sep.join(parts)


def esc(s):
    return s.encode("unicode_escape").decode("ascii").replace("\t", "\\t")


UNESCAPE_CASES = [
    "&amp;lt; &nbsp;&#x48;&notareal;&ampx",
    "plain text no entities",
    "&amp;&lt;&gt;&quot;&apos;",
    "&copy; 2026 &reg; &trade; &hellip; &mdash;&ndash;",
    "&#65;&#x41;&#X41;&#65 no-semicolon",
    "&#0; &#13; &#128; &#151; &#xD800; &#x110000; &#1114112;",
    "&#x1F600; astral &#128512;",
    "&notit; &notin; &not x",
    "&CounterClockwiseContourIntegral; long name",
    "&frac12;&sup2;&eacute;&Eacute;&uuml;",
    "台北市&nbsp;信義區 &amp; 松山區",
    "&amp;amp; double &amp;#60; nested",
    "&unknown; &fake &",
    "A&AMP;B &LT;tag&GT;",
    "&times;&divide;&plusmn;&deg;",
    "salary &ge; 40,000 &le; 50,000",
    "&quot;json&quot;: {&quot;k&quot;: 1}",
    "&#8364; euro &#x20AC;",
    "mixed &aacute;&acirc;&atilde; end",
    "&thinsp;&ensp;&emsp;&zwnj;&zwj;",
]

GETTEXT_CASES = [
    "<p> a <b>b</b><!--c--> &amp; <script>var x=1;</script> d </p>",
    "<div>hello <span>world</span></div>",
    "<p>one</p><p>two</p>",
    "  leading <b> ws </b> trailing  ",
    "<ul><li>項目一</li><li>項目二</li></ul>",
    "<div>工作內容：<br/>1. 開發<br>2. 維護</div>",
    "no tags at all",
    "<p>a &lt; b &gt; c &amp;&amp; d</p>",
    "<style>.x{color:red}</style><p>visible</p>",
    "<script type=\"text/javascript\">if (a<b) {}</script>after",
    "<p>before<!-- comment with <tags> -->after</p>",
    "<div class='a'>quoted '<i>single</i>'</div>",
    "<a href=\"http://x.com?a=1&amp;b=2\">link</a> tail",
    "<p>unclosed <b>bold",
    "</p>stray end tag<p>ok</p>",
    "<p>lone < bracket</p>",
    "<p>nbsp here</p>",
    "<P>UPPER <B>CASE</B></P>",
    "<div>薪資待遇：月薪 40,000 - 50,000 元</div>",
    "<br><hr><img src='x.png'>void tags<input type='text'>",
    "<div><div><div>deep</div></div></div>",
    "<p>tab\there</p>",
    "<p>multi\n\nline</p>",
    "text<script>skip</script>between<style>also</style>end",
    "<!DOCTYPE html><html><head><title>T</title></head><body>B</body></html>",
    "<p>a<![CDATA[ raw ]]>b</p>",
    "<?php echo 1; ?>visible",
    "<p>&#9731; snowman &#x2603;</p>",
    "<td>cell1</td><td>cell2</td>",
    "<p>  </p><p>x</p>",  # whitespace-only node dropped by strip
    "<div>台灣 台北市信義區信義路五段7號</div>",
    "<span>A</span> <span>B</span>  <span>C</span>",
    "<p>emoji 😀 inline</p>",
    "<script></script>empty script",
    "<p title=\"tip &amp; trick\">attr entity</p>",
    "<div>a<b>b</b>c<i>d</i>e</div>",
    "<p>【工作內容】 負責開發 【其他】 福利</p>",
    "資本額：1,000萬元 員工人數：50人",
    "<div> <!-- c1 --> x <!-- c2 --> y </div>",
    "<p>a</p \n>weird end",
]

# title extraction cases: (html, expected .title.string.strip() or "")
TITLE_CASES = [
    "<html><head><title> 軟體工程師｜测试公司 - 104人力銀行 </title></head></html>",
    "<title>simple</title>",
    "<title>with &amp; entity</title>",
    "<html><body>no title</body></html>",
    "<title></title>",
    "<title>multi <b>child</b></title>",  # .string -> None -> ""
    "<TITLE>upper tag</TITLE>",
]

JSON_CASES = [
    '{"@type":"JobPosting","title":"工程師","b":1,"a":2}',
    '{"z":1,"y":{"nested":[1,2.5,"s",null,true,false]},"x":"中文"}',
    '{"f":1.0,"g":0.1,"h":1e16,"i":1.5e-7,"j":-0.0}',
    '{"dup":1,"dup":2,"other":3}',
    '{"esc":"line\\nbreak\\ttab\\"quote\\\\back"}',
    '{"unicode":"\\u4e2d\\u6587\\ud83d\\ude00"}',
    '[{"a":1},{"b":2}]',
    '{"empty":{},"earr":[],"estr":""}',
    '{"big":123456789012345678901234567890}',
    '{"neg":-42,"negf":-3.14}',
    '{"salary":{"@type":"MonetaryAmount","currency":"TWD","value":{"@type":"QuantitativeValue","minValue":40000,"maxValue":60000,"unitText":"MONTH"}}}',
    '{"spaces":  "kept"  ,  "n": 1}',
]


def main():
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "unescape.tsv"), "w", encoding="ascii") as f:
        for c in UNESCAPE_CASES:
            f.write(esc(c) + "\t" + esc(html_lib.unescape(c)) + "\n")
    with open(os.path.join(OUT, "gettext.tsv"), "w", encoding="ascii") as f:
        for c in GETTEXT_CASES:
            f.write(esc(c) + "\t" + esc(get_text(c)) + "\n")
    with open(os.path.join(OUT, "title.tsv"), "w", encoding="ascii") as f:
        for c in TITLE_CASES:
            # mirror crawl_service.py:319-320 (title.string or "")
            class T(HTMLParser):
                def __init__(self):
                    super().__init__(convert_charrefs=True)
                    self.in_title = 0
                    self.depth_inside = 0
                    self.texts = []
                    self.has_child_tag = False
                def handle_starttag(self, tag, attrs):
                    if tag == "title" and self.in_title == 0:
                        self.in_title = 1
                    elif self.in_title:
                        self.has_child_tag = True
                def handle_endtag(self, tag):
                    if tag == "title":
                        self.in_title = 0
                def handle_data(self, d):
                    if self.in_title:
                        self.texts.append(d)
            t = T()
            t.feed(c)
            t.close()
            # .string is None when the title has multiple children
            if t.has_child_tag or len(t.texts) != 1:
                expected = "" if not (len(t.texts) == 1 and not t.has_child_tag) else t.texts[0].strip()
            else:
                expected = t.texts[0].strip()
            f.write(esc(c) + "\t" + esc(expected) + "\n")
    with open(os.path.join(OUT, "json_roundtrip.tsv"), "w", encoding="ascii") as f:
        for c in JSON_CASES:
            f.write(esc(c) + "\t" + esc(json.dumps(json.loads(c), ensure_ascii=False)) + "\n")
    print("goldens written to", OUT)


if __name__ == "__main__":
    main()
