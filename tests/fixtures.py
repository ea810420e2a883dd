"""Inline fixture documents mirroring the reference's example-docs
families (FIXTURES.md §1): blank-line + hard-wrapped text, rich HTML,
CSV with escaped commas, markdown with code fences, RFC-822 email with
attachment, empty file."""

FAKE_TEXT = """About the author

Dwight Eisenhower was an American military officer. He served as the
34th president of the United States.

• A bullet point
• Another bullet

1. First numbered item
2. Second numbered item

CONCLUSION

In conclusion, this is narrative text that contains a verb and is
long enough to be split into two sentences. It makes the point well.
"""

FAKE_HTML = """<!DOCTYPE html>
<html>
<head><title>ignored</title><style>p { color: red }</style></head>
<body>
<header>Acme Corp Quarterly</header>
<h1>Annual Report</h1>
<p>This is a <b>bold statement</b> that was written for the report. It includes two sentences for good measure.</p>
<h2>Financials</h2>
<p>Revenue was strong. See <a href="https://example.com/details">the details</a> for more.</p>
<ul><li>First item</li><li>Second item</li></ul>
<table>
  <tr><th>Quarter</th><th>Revenue</th></tr>
  <tr><td>Q1</td><td>100</td></tr>
  <tr><td>Q2</td><td>200</td></tr>
</table>
<pre>def f():
    return 1</pre>
<figure><img alt="A chart of revenue"/><figcaption>Figure 1: Revenue</figcaption></figure>
<footer>Page 1 of 10</footer>
</body>
</html>
"""

FAKE_CSV = 'name,title,city\n"Smith, John",Engineer,Austin\n"Doe, Jane",Manager,Boston\n'

FAKE_MD = """# Heading One

Some paragraph text that describes the project. It has been written with care.

## Subheading

- bullet one
- bullet two

```python
print("hello")
```

| a | b |
|---|---|
| 1 | 2 |
"""

FAKE_EMAIL = """From: sender@example.com
To: recipient@example.com, other@example.com
Cc: cc@example.com
Subject: Test email
Message-ID: <msg-123@example.com>
Date: Mon, 5 Jun 2023 10:00:00 +0000
MIME-Version: 1.0
Content-Type: multipart/mixed; boundary="BOUND"

--BOUND
Content-Type: text/plain; charset="utf-8"

Hello there!

This is the body of the email. It was sent for testing purposes.
--BOUND
Content-Type: text/plain; charset="utf-8"
Content-Disposition: attachment; filename="notes.txt"

Attachment paragraph content here.
--BOUND--
"""

EMPTY_TEXT = ""
