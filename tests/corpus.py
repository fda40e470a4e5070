"""HTML snippet corpus for differential testing.

Every snippet the reference pytest suite pins (FIXTURES.md §2) plus extra
adversarial cases around the tokenizer/parser quirks.  Expected outputs are
always computed by running the vendored reference — never hardcoded.
"""

SNIPPETS = [
    # --- entities (test_tokenizer.py:9-63) ---
    "&amp;",
    "&LT;x&GT;",
    "&lt;Some text.&gt;",
    "&entity Some text",
    "&" + "a" * 21 + ";",
    "&a a",
    "&;",
    "&;x",
    "a&;b",
    "&#65;&#x41;&#X41;",
    "&nbsp;&nonbreakingspace;&quot;&apos;&cent;&pound;&yen;&euro;&copy;&reg;",
    "&unknown;&UnKnOwN;",
    "&",
    "x&",
    "&amp",
    # --- comments (test_tokenizer.py:66-89, 292-299; test_comment.py) ---
    "aaa <!-- comment -->",
    "aaa <!-- comment ",
    '<html><!-- asd " asd" > asd --></html>',
    "<head><!-- --></head>",
    "<!---->",
    "<!--->",
    "<!-- a --> <!-- b -->",
    "<!-",
    # --- tag forms (test_tokenizer.py:80-150, 159-229) ---
    "<>",
    "<> ",
    "< >",
    "<  tag  >",
    "<tag rectangle>",
    "<  tag   key   =   value  >",
    "<tag a=bbb asd = \"bsd \" @weird=parameters key='v a l' rect>",
    "<tag key=value key=value2 KEY=value3>",
    '<tag key="a &quot; a">',
    "<tag key='a &amp; b'>",
    '<html><tag params="<html_tag>"></html>',
    '<ubertag attribute="long attribute\n                continues here">',
    "<tag /  >",
    "<tag/>",
    "<tag />",
    "<tag a/>",
    "<tag a / >",
    "<jsObfuscator/>",
    "</tag>",
    "</ tag>x",
    "< /tag>x",
    "<tag=x>",
    "<<>",
    "<<x>",
    "<tag a b>",
    "<tag a b=c>",
    "<tag ='v'>",
    '<tag a="">',
    "<tag a=''>",
    # --- malformed recovery (test_tokenizer.py:153-156, 320-346) ---
    "<invalid tag=something\">notice",
    "<code>Bla</code <tag>",
    "<code>Bla</code\n<!-- -->",
    "<code>5 < 10.</code>",
    "<tag",
    "<tag ",
    "<tag a=",
    '<tag a="',
    "<tag a='x",
    "<t a=v",
    "< ",
    "<",
    # --- non-pair reshaping (test_parser.py:130-217) ---
    "<div><br><img><hr></div>",
    "<div><br><img><hr>",
    "<div><br><b>x</b><img></div>",
    "<div><br>text<img>more<hr>tail</div>",
    "<div><br><br></div>",
    "<div><span><b>x</div>",
    "<a><b><c><d></b></a>",
    (
        '<!DOCTYPE html>\n<html>\n<head>\n<meta charset="utf-8">\n'
        '<meta name="viewport" content="width=device-width, initial-scale=1">\n'
        '<link rel="stylesheet" href="s.css">\n<script src="x.js"></script>\n'
        "<title>t</title>\n</head>\n<body>\n<p>hi</p>\n</body>\n</html>"
    ),
    # --- parser structure (test_parser.py) ---
    '<html><tag PARAM="true"></html>',
    "asd",
    "",
    " ",
    "a",
    "<a>x</a><b>y</b>",
    "<a>x</a>",
    "xx <a>x</a>",
    "</span>text",
    "<p>one</p></span><p>two</p>",
    "\xef\xbb\xbf<a>bom</a>",
    "\xef\xbb\xbf",
    "﻿<a>realbom</a>",
    # --- find/query docs (test_tag.py) ---
    (
        '<div id="first">\n  First div.\n  <div id="first.subdiv">\n'
        "    Subdiv in first div.\n  </div>\n</div>\n"
        '<div id="second">\n  Second.\n</div>'
    ),
    (
        "<root><some><something><xe id='wanted' /></something>"
        "<something><xe id='notwanted' /></something>"
        "<xe id='second' /></some><some><xe id='third' /></some></root>"
    ),
    (
        '<html><body><article><div class="page-body"><p>text</p>'
        '<div class="page-body"><p>deep</p></div></div></article></body></html>'
    ),
    # --- serialization edges (test_tag.py:78-133, 742-817) ---
    "<div param=1>&lt;</div>",
    '<test param="more &quot; more" />',
    "<blockquote>Message-ID: &lt;9208&gt;</blockquote>",
    "<script>if (a < b && c > d) {}</script>",
    "<style>p > a { color: \"red\"; }</style>",
    "<pre>  keep\n  me  </pre>",
    "<p>a 'quote' and \"dquote\"</p>",
    "<P CLASS='x'>MiXeD</P>",
    "<a href=#>anchor</a>",
    "<meta charset=utf-8>",
    # --- entity edge in attrs/values ---
    '<a b="&#65;">x</a>',
    '<a b="&bad">x</a>',
    '<a b="& loose">x</a>',
    '<a b="&amp">x</a>',
    "<a b=&amp;>x</a>",
    # --- whitespace set: \r is NOT whitespace ---
    "<tag\r>x",
    "<tag \r a=b>x",
    "a\rb",
    # --- misc nesting ---
    "<ul><li>1<li>2<li>3</ul>",
    "<table><tr><td>a<td>b</tr></table>",
    "<b><i>both</b></i>",
    "<x>1<y>2<z>3</x>",
]


def fixture_pages():
    """(case_id, snippet) rows used to build fixture pages in Spark tests."""
    return [(f"case{i:03d}", s) for i, s in enumerate(SNIPPETS)]
