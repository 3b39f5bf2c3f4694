"""Embedded stylesheet injected by GlueDocument.

The reference ships a resource stylesheet (Resources/readability.css) whose
*presence* — one <style> element in <head> — is what its tests assert
(Tests/NReadabilityTranscoderTests.cs:407-417). This is an original,
equivalent-purpose stylesheet (not a copy) covering the same class
hooks the glue step emits: reading styles, margins, sizes, and the
overlay/inner container ids.
"""

READABILITY_CSS = """
body { margin: 0; padding: 0; }
#readOverlay { position: relative; min-height: 100%; }
#readInner { max-width: 800px; margin: 0 auto; padding: 2em 1em; }
#readInner h1 { font-size: 1.6em; line-height: 1.2; margin: 0 0 0.6em; }
#readInner p { line-height: 1.5; margin: 0 0 1em; }
.style-newspaper { font-family: Georgia, serif; background: #fbfbf3; color: #222; }
.style-novel { font-family: Palatino, serif; background: #f6f1e5; color: #222; }
.style-ebook { font-family: Helvetica, Arial, sans-serif; background: #fff; color: #111; }
.style-terminal { font-family: monospace; background: #112; color: #2e2; }
.margin-x-narrow #readInner { max-width: 1200px; }
.margin-narrow #readInner { max-width: 1000px; }
.margin-medium #readInner { max-width: 900px; }
.margin-wide #readInner { max-width: 800px; }
.margin-x-wide #readInner { max-width: 600px; }
.size-x-small { font-size: 12px; }
.size-small { font-size: 14px; }
.size-medium { font-size: 16px; }
.size-large { font-size: 18px; }
.size-x-large { font-size: 20px; }
.readability-styled { display: inline; }
.page-separator { border-bottom: 1px dotted #999; text-align: center; }
""".strip()
