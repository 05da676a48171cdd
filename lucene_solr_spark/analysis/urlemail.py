"""UAX29URLEmailTokenizer — the standard tokenizer variant that keeps
URLs and e-mail addresses as single tokens.

Re-derives the reference's JFlex grammar
(UAX29URLEmailTokenizerImpl.jflex:55-145: RFC-3986-shaped HTTP/FTP/FILE
URLs with IPv4/IPv6/strict-and-loose domain hosts over the shipped IANA
TLD snapshot, RFC-5321/5322-shaped e-mails) as Python regexes, with JFlex
maximal-munch + rule-priority semantics: at each position the longest of
URL / mailto-prefix / EMAIL / word wins, URL first on ties. Verified
against the reference's own fixture pair (random.text.with.urls.txt →
urls.from.random.text.with.urls.txt and the e-mail pair): every extracted
URL/EMAIL token byte-identical.
"""

from __future__ import annotations

import re

from .analyzer import _PY_TOKEN_RE
from .tld_data import TLDS

_TLD = r"\.(?i:" + "|".join(
    sorted((re.escape(t) for t in TLDS), key=len, reverse=True)
) + r")\.?"

_DOMAIN_LABEL = r"[A-Za-z0-9](?:[-A-Za-z0-9]*[A-Za-z0-9])?"
_DOMAIN_STRICT = rf"{_DOMAIN_LABEL}(?:\.{_DOMAIN_LABEL})*(?:{_TLD})"
_DOMAIN_LOOSE = rf"{_DOMAIN_LABEL}(?:\.{_DOMAIN_LABEL})*"

# alternatives longest-first: Python regex picks the first matching
# alternative, JFlex the longest
_IPV4_OCTET = (r"(?:2(?:[0-4][0-9]|5[0-5])|1[0-9][0-9]|0?[1-9][0-9]"
               r"|0{0,2}[0-9])")
_IPV4 = rf"{_IPV4_OCTET}(?:\.{_IPV4_OCTET}){{3}}"
_H16 = r"[0-9A-Fa-f]{1,4}"
_LS32 = rf"(?:{_IPV4}|{_H16}:{_H16})"
_IPV6 = (
    rf"(?:(?:{_H16}:){{6}}{_LS32}"
    rf"|::(?:{_H16}:){{5}}{_LS32}"
    rf"|(?:{_H16})?::(?:{_H16}:){{4}}{_LS32}"
    rf"|(?:(?:{_H16}:)?{_H16})?::(?:{_H16}:){{3}}{_LS32}"
    rf"|(?:(?:{_H16}:){{0,2}}{_H16})?::(?:{_H16}:){{2}}{_LS32}"
    rf"|(?:(?:{_H16}:){{0,3}}{_H16})?::{_H16}:{_LS32}"
    rf"|(?:(?:{_H16}:){{0,4}}{_H16})?::{_LS32}"
    rf"|(?:(?:{_H16}:){{0,5}}{_H16})?::{_H16}"
    rf"|(?:(?:{_H16}:){{0,6}}{_H16})?::)"
)

_UNRESERVED = r"[-._~A-Za-z0-9]"
_PCT = r"%[0-9A-Fa-f]{2}"
_SUB_DELIMS = r"[!$&'()*+,;=]"
_LOGIN_SEG = rf"(?:{_UNRESERVED}|{_PCT}|{_SUB_DELIMS})*"
_LOGIN = rf"{_LOGIN_SEG}(?::{_LOGIN_SEG})?@"
_QUERY = rf"\?(?:{_UNRESERVED}|{_PCT}|{_SUB_DELIMS}|[:@/?])*"
_FRAGMENT = rf"#(?:{_UNRESERVED}|{_PCT}|{_SUB_DELIMS}|[:@/?])*"
_PORT = r":[0-9]{1,5}"
_HOST_STRICT = rf"(?:\[{_IPV6}\]|{_IPV4}|{_DOMAIN_STRICT})"
_HOST_LOOSE = rf"(?:\[{_IPV6}\]|{_IPV4}|{_DOMAIN_LOOSE})"
_AUTH_STRICT = rf"{_HOST_STRICT}(?:{_PORT})?"
_AUTH_LOOSE = rf"(?:{_LOGIN})?{_HOST_LOOSE}(?:{_PORT})?"

_HTTP_SEG = rf"(?:{_UNRESERVED}|{_PCT}|[;:@&=])*"
_HTTP_PATH = rf"(?:/{_HTTP_SEG})*"
_HTTP_FULL = (rf"[hH][tT][tT][pP][sS]?://{_AUTH_LOOSE}"
              rf"(?:{_HTTP_PATH})?(?:{_QUERY})?(?:{_FRAGMENT})?")
_HTTP_NOSCHEME = (rf"{_AUTH_STRICT}(?:{_HTTP_PATH})?"
                  rf"(?:{_QUERY})?(?:{_FRAGMENT})?")

_FF_SEG = rf"(?:{_UNRESERVED}|{_PCT}|[?:@&=])*"
_FF_PATH = rf"/{_FF_SEG}(?:/{_FF_SEG})*"
_FTP = (rf"[fF][tT][pP]://{_AUTH_LOOSE}{_FF_PATH}"
        rf"(?:;[tT][yY][pP][eE]=[aAiIdD])?(?:{_FRAGMENT})?")
_FILE = (rf"[fF][iI][lL][eE]://(?:{_HOST_LOOSE})?{_FF_PATH}"
         rf"(?:{_FRAGMENT})?")

URL_RE = re.compile(rf"(?:{_HTTP_FULL}|{_HTTP_NOSCHEME}|{_FTP}|{_FILE})")

_EMAIL_QS = (r'"(?:[\x01-\x08\x0b\x0c\x0e-\x21\x23-\x5b\x5d-\x7e]'
             r'|\\[\x00-\x7f])*"')
_EMAIL_ATOM = r"[A-Za-z0-9!#$%&'*+\-/=?^_`{|}~]"
_EMAIL_LABEL = rf"(?:{_EMAIL_ATOM}+|{_EMAIL_QS})"
_EMAIL_LOCAL = rf"{_EMAIL_LABEL}(?:\.{_EMAIL_LABEL})*"
_EMAIL_DLT = r"(?:[\x01-\x08\x0b\x0c\x0e-\x5a\x5e-\x7f]|\\[\x00-\x7f])"
_EMAIL_BRACKET = (rf"\[(?:{_EMAIL_DLT}*|{_IPV4}"
                  rf"|[iI][pP][vV]6:{_IPV6})\]")
EMAIL_RE = re.compile(
    rf"{_EMAIL_LOCAL}@(?:{_DOMAIN_STRICT}|{_EMAIL_BRACKET})")

_MAILTO_RE = re.compile(rf"[mM][aA][iI][lL][tT][oO](?=:{EMAIL_RE.pattern})")

URL_TYPE = "<URL>"
EMAIL_TYPE = "<EMAIL>"
WORD_TYPE = "<ALPHANUM>"


def uax29_url_email_tokenize(text: str) -> list[tuple[str, str]]:
    """(token, type) stream: URLs and e-mails single tokens, everything
    else per the standard UAX#29 word rules."""
    out: list[tuple[str, str]] = []
    i = 0
    n = len(text)
    while i < n:
        m_url = URL_RE.match(text, i)
        m_mailto = _MAILTO_RE.match(text, i)
        m_email = EMAIL_RE.match(text, i)
        m_word = _PY_TOKEN_RE.match(text, i)
        # JFlex maximal munch; rule order URL, mailto, EMAIL, word on ties
        best = None
        best_len = 0
        for m, typ in ((m_url, URL_TYPE), (m_mailto, WORD_TYPE),
                       (m_email, EMAIL_TYPE), (m_word, WORD_TYPE)):
            if m is not None and m.end() - i > best_len:
                best = (m, typ)
                best_len = m.end() - i
        if best is None:
            i += 1
            continue
        m, typ = best
        out.append((m.group(0), typ))
        i = m.end()
    return out
