"""Packaged Public Suffix List snapshot (two-label suffixes).

``registered_domain`` needs to know when the registrable (pay-level)
domain of a host is THREE labels instead of two — ``example.gov.uk``
registers under ``gov.uk``, not ``uk``. The authority for that is the
Public Suffix List (publicsuffix.org, Mozilla-maintained public data).
This module packages a curated snapshot of the PSL's ICANN section
restricted to TWO-LABEL suffixes (``co.uk``-style ccTLD second-level
registrations plus the US-state and Canadian-province namespaces),
which covers the overwhelming share of real crawl traffic that the
previous 5-entry subset got wrong (round-10 verdict: every
``gov.uk``/``ac.jp``/``com.cn`` host rolled up to the wrong domain).

Plan shape: the set compiles into the Spark plan as a literal
``isin`` (Catalyst InSet — a map-side hash probe inside whole-stage
codegen, cheaper than a broadcast join and identical at any scale).
The DuckDB oracles interpolate the SAME tuple into their SQL, so
operator and oracle can never drift.

Documented limitations of the snapshot (acceptable for the dedup /
crawl-budget rollups this feeds; swap in the full live PSL file for
registrar-grade accuracy — same plan shape, bigger literal set):

- three-label public suffixes (``pref.aichi.jp``, ``act.edu.au``) and
  wildcard rules (``*.ck``) are not modeled — those hosts fall back to
  a two- or three-label rollup;
- a few packaged entries flatten what the real PSL expresses as a
  WILDCARD rule — ``sch.uk`` is ``*.sch.uk`` upstream (every
  ``<school>.sch.uk`` is itself a public suffix, so the registrable
  domain of ``www.x.sch.uk`` is ``www.x.sch.uk``, four labels), and
  this snapshot instead rolls such hosts up to ``x.sch.uk`` — one
  label short. These entries intentionally approximate ``*.suffix``
  rules as plain two-label rules; a future full-PSL swap must model
  the wildcard class explicitly rather than inherit them as-is;
- the PRIVATE section (``github.io``-style operator namespaces) is
  deliberately excluded: for crawl budgeting you usually WANT all of
  ``github.io`` rolled into one pay-level domain.
"""

from __future__ import annotations

# fmt: off
TWO_LEVEL_SUFFIXES: tuple[str, ...] = (
    # United Kingdom
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "nhs.uk",
    "org.uk", "plc.uk", "police.uk", "sch.uk",
    # Japan
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    # Australia
    "asn.au", "com.au", "edu.au", "gov.au", "id.au", "net.au", "org.au",
    # Brazil
    "art.br", "com.br", "edu.br", "gov.br", "mil.br", "net.br", "org.br",
    # China
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "mil.cn", "net.cn", "org.cn",
    # India
    "ac.in", "co.in", "edu.in", "firm.in", "gen.in", "gov.in", "ind.in",
    "mil.in", "net.in", "nic.in", "org.in", "res.in",
    # New Zealand
    "ac.nz", "co.nz", "cri.nz", "geek.nz", "gen.nz", "govt.nz",
    "health.nz", "iwi.nz", "kiwi.nz", "maori.nz", "mil.nz", "net.nz",
    "org.nz", "parliament.nz", "school.nz",
    # South Africa
    "ac.za", "co.za", "edu.za", "gov.za", "mil.za", "net.za", "nom.za",
    "org.za", "web.za",
    # South Korea
    "ac.kr", "co.kr", "es.kr", "go.kr", "hs.kr", "kg.kr", "mil.kr",
    "ms.kr", "ne.kr", "or.kr", "pe.kr", "re.kr", "sc.kr",
    # Mexico
    "com.mx", "edu.mx", "gob.mx", "net.mx", "org.mx",
    # Argentina
    "com.ar", "edu.ar", "gob.ar", "int.ar", "mil.ar", "net.ar",
    "org.ar", "tur.ar",
    # Turkey
    "av.tr", "bel.tr", "biz.tr", "com.tr", "dr.tr", "edu.tr", "gen.tr",
    "gov.tr", "info.tr", "k12.tr", "name.tr", "net.tr", "org.tr",
    "pol.tr", "tel.tr", "tv.tr", "web.tr",
    # Israel
    "ac.il", "co.il", "gov.il", "idf.il", "k12.il", "muni.il", "net.il",
    "org.il",
    # Indonesia
    "ac.id", "biz.id", "co.id", "desa.id", "go.id", "mil.id", "my.id",
    "net.id", "or.id", "ponpes.id", "sch.id", "web.id",
    # Thailand
    "ac.th", "co.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    # Taiwan
    "club.tw", "com.tw", "ebiz.tw", "edu.tw", "game.tw", "gov.tw",
    "idv.tw", "mil.tw", "net.tw", "org.tw",
    # Hong Kong
    "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    # Singapore
    "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg", "per.sg",
    # Malaysia
    "com.my", "edu.my", "gov.my", "mil.my", "name.my", "net.my",
    "org.my",
    # Philippines
    "com.ph", "edu.ph", "gov.ph", "i.ph", "mil.ph", "net.ph", "ngo.ph",
    "org.ph",
    # Vietnam
    "ac.vn", "biz.vn", "com.vn", "edu.vn", "gov.vn", "health.vn",
    "info.vn", "int.vn", "name.vn", "net.vn", "org.vn", "pro.vn",
    # Egypt
    "com.eg", "edu.eg", "eun.eg", "gov.eg", "mil.eg", "name.eg",
    "net.eg", "org.eg", "sci.eg",
    # Saudi Arabia
    "com.sa", "edu.sa", "gov.sa", "med.sa", "net.sa", "org.sa",
    "pub.sa", "sch.sa",
    # Kenya
    "ac.ke", "co.ke", "go.ke", "info.ke", "me.ke", "mobi.ke", "ne.ke",
    "or.ke", "sc.ke",
    # Nigeria
    "com.ng", "edu.ng", "gov.ng", "i.ng", "mil.ng", "mobi.ng",
    "name.ng", "net.ng", "org.ng", "sch.ng",
    # Pakistan
    "biz.pk", "com.pk", "edu.pk", "fam.pk", "gok.pk", "gop.pk",
    "gos.pk", "gov.pk", "net.pk", "org.pk", "web.pk",
    # Bangladesh
    "ac.bd", "com.bd", "edu.bd", "gov.bd", "mil.bd", "net.bd", "org.bd",
    # Nepal
    "biz.np", "com.np", "coop.np", "edu.np", "gov.np", "info.np",
    "mil.np", "name.np", "net.np", "org.np", "pro.np",
    # Ukraine
    "com.ua", "edu.ua", "gov.ua", "in.ua", "net.ua", "org.ua",
    # Poland
    "biz.pl", "com.pl", "edu.pl", "gov.pl", "info.pl", "net.pl",
    "org.pl", "waw.pl",
    # Colombia
    "com.co", "edu.co", "firm.co", "gov.co", "info.co", "int.co",
    "mil.co", "net.co", "nom.co", "org.co", "rec.co", "web.co",
    # Peru
    "com.pe", "edu.pe", "gob.pe", "mil.pe", "net.pe", "nom.pe",
    "org.pe",
    # Chile
    "gob.cl", "gov.cl", "mil.cl",
    # Venezuela
    "co.ve", "com.ve", "edu.ve", "gob.ve", "info.ve", "mil.ve",
    "net.ve", "org.ve", "web.ve",
    # Ecuador
    "com.ec", "edu.ec", "fin.ec", "gob.ec", "gov.ec", "info.ec",
    "k12.ec", "med.ec", "mil.ec", "net.ec", "org.ec", "pro.ec",
    # Uruguay
    "com.uy", "edu.uy", "gub.uy", "mil.uy", "net.uy", "org.uy",
    # Paraguay
    "com.py", "coop.py", "edu.py", "gov.py", "mil.py", "net.py",
    "org.py", "una.py",
    # Bolivia
    "com.bo", "edu.bo", "gob.bo", "int.bo", "mil.bo", "net.bo",
    "org.bo", "tv.bo", "web.bo",
    # Costa Rica
    "ac.cr", "co.cr", "ed.cr", "fi.cr", "go.cr", "or.cr", "sa.cr",
    # Guatemala
    "com.gt", "edu.gt", "gob.gt", "ind.gt", "mil.gt", "net.gt",
    "org.gt",
    # Dominican Republic
    "art.do", "com.do", "edu.do", "gob.do", "gov.do", "mil.do",
    "net.do", "org.do", "sld.do", "web.do",
    # Sri Lanka
    "ac.lk", "assn.lk", "com.lk", "edu.lk", "gov.lk", "grp.lk",
    "hotel.lk", "int.lk", "ltd.lk", "net.lk", "ngo.lk", "org.lk",
    "sch.lk", "soc.lk", "web.lk",
    # Iran
    "ac.ir", "co.ir", "gov.ir", "id.ir", "net.ir", "org.ir", "sch.ir",
    # United Arab Emirates
    "ac.ae", "co.ae", "gov.ae", "mil.ae", "net.ae", "org.ae", "sch.ae",
    # Qatar
    "com.qa", "edu.qa", "gov.qa", "mil.qa", "name.qa", "net.qa",
    "org.qa", "sch.qa",
    # Kuwait
    "com.kw", "edu.kw", "emb.kw", "gov.kw", "ind.kw", "net.kw",
    "org.kw",
    # Oman
    "co.om", "com.om", "edu.om", "gov.om", "med.om", "museum.om",
    "net.om", "org.om", "pro.om",
    # Jordan
    "com.jo", "edu.jo", "gov.jo", "mil.jo", "name.jo", "net.jo",
    "org.jo", "sch.jo",
    # Lebanon
    "com.lb", "edu.lb", "gov.lb", "net.lb", "org.lb",
    # Morocco
    "ac.ma", "co.ma", "gov.ma", "net.ma", "org.ma", "press.ma",
    # Tunisia
    "com.tn", "gov.tn", "net.tn", "org.tn",
    # Algeria
    "art.dz", "asso.dz", "com.dz", "edu.dz", "gov.dz", "net.dz",
    "org.dz", "pol.dz",
    # Ghana
    "com.gh", "edu.gh", "gov.gh", "mil.gh", "org.gh",
    # Tanzania
    "ac.tz", "co.tz", "go.tz", "hotel.tz", "info.tz", "me.tz",
    "mil.tz", "mobi.tz", "ne.tz", "or.tz", "sc.tz", "tv.tz",
    # Uganda
    "ac.ug", "co.ug", "com.ug", "go.ug", "ne.ug", "or.ug", "org.ug",
    "sc.ug",
    # Zambia
    "ac.zm", "biz.zm", "co.zm", "com.zm", "edu.zm", "gov.zm",
    "info.zm", "mil.zm", "net.zm", "org.zm", "sch.zm",
    # Zimbabwe
    "ac.zw", "co.zw", "gov.zw", "mil.zw", "org.zw",
    # Ethiopia
    "biz.et", "com.et", "edu.et", "gov.et", "info.et", "name.et",
    "net.et", "org.et",
    # Serbia
    "ac.rs", "co.rs", "edu.rs", "gov.rs", "in.rs", "org.rs",
    # Bosnia and Herzegovina
    "com.ba", "edu.ba", "gov.ba", "net.ba", "org.ba",
    # Greece
    "com.gr", "edu.gr", "gov.gr", "net.gr", "org.gr",
    # Cyprus
    "ac.cy", "com.cy", "gov.cy", "net.cy", "org.cy",
    # Malta
    "com.mt", "edu.mt", "gov.mt", "net.mt", "org.mt",
    # Romania
    "arts.ro", "com.ro", "firm.ro", "info.ro", "nom.ro", "nt.ro",
    "org.ro", "rec.ro", "store.ro", "tm.ro", "www.ro",
    # Hungary
    "co.hu", "info.hu", "org.hu", "priv.hu", "tm.hu",
    # Estonia
    "aip.ee", "com.ee", "edu.ee", "fie.ee", "gov.ee", "lib.ee",
    "med.ee", "org.ee", "pri.ee", "riik.ee",
    # Latvia
    "asn.lv", "com.lv", "conf.lv", "edu.lv", "gov.lv", "id.lv",
    "mil.lv", "net.lv", "org.lv",
    # Lithuania
    "gov.lt",
    # Italy
    "edu.it", "gov.it",
    # France
    "asso.fr", "com.fr", "gouv.fr", "nom.fr", "prd.fr", "tm.fr",
    # Portugal
    "com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "nome.pt",
    "org.pt", "publ.pt",
    # Spain
    "com.es", "edu.es", "gob.es", "nom.es", "org.es",
    # Austria
    "ac.at", "co.at", "gv.at", "or.at",
    # Belgium
    "ac.be",
    # Ireland
    "gov.ie",
    # Sweden (letter districts omitted)
    "com.se", "org.se", "parti.se", "pp.se", "press.se", "tm.se",
    # Norway (geographic namespaces omitted)
    "mil.no", "priv.no",
    # Channel Islands / Isle of Man
    "co.gg", "net.gg", "org.gg", "co.je", "net.je", "org.je",
    "ac.im", "co.im", "com.im", "gov.im", "net.im", "org.im", "tt.im",
    "tv.im",
    # Kazakhstan / Central Asia
    "com.kz", "edu.kz", "gov.kz", "mil.kz", "net.kz", "org.kz",
    "co.uz", "com.uz", "net.uz", "org.uz",
    "com.kg", "edu.kg", "gov.kg", "mil.kg", "net.kg", "org.kg",
    "com.tj", "edu.tj", "gov.tj", "net.tj", "org.tj",
    "co.tm", "com.tm", "edu.tm", "gov.tm", "mil.tm", "net.tm",
    "nom.tm", "org.tm",
    # Caucasus
    "com.ge", "edu.ge", "gov.ge", "mil.ge", "net.ge", "org.ge",
    "pvt.ge",
    "co.am", "com.am", "net.am", "org.am",
    "biz.az", "com.az", "edu.az", "gov.az", "info.az", "int.az",
    "mil.az", "name.az", "net.az", "org.az", "pro.az",
    # Belarus
    "com.by", "gov.by", "mil.by", "of.by",
    # North Macedonia
    "com.mk", "edu.mk", "gov.mk", "inf.mk", "name.mk", "net.mk",
    "org.mk",
    # Albania
    "com.al", "edu.al", "gov.al", "mil.al", "net.al", "org.al",
    # Montenegro
    "ac.me", "co.me", "edu.me", "gov.me", "its.me", "net.me", "org.me",
    "priv.me",
    # Angola / Mozambique / Botswana / Namibia / Malawi / Rwanda /
    # Burundi / Madagascar / Mauritius / Seychelles
    "co.ao", "ed.ao", "gv.ao", "it.ao", "og.ao", "pb.ao",
    "ac.mz", "co.mz", "edu.mz", "gov.mz", "net.mz", "org.mz",
    "co.bw", "org.bw",
    "co.na", "com.na",
    "ac.mw", "biz.mw", "co.mw", "com.mw", "coop.mw", "edu.mw",
    "gov.mw", "int.mw", "net.mw", "org.mw",
    "ac.rw", "co.rw", "coop.rw", "gov.rw", "mil.rw", "net.rw", "org.rw",
    "co.bi", "com.bi", "edu.bi", "or.bi", "org.bi",
    "co.mg", "com.mg", "edu.mg", "gov.mg", "mil.mg", "nom.mg",
    "org.mg", "prd.mg", "tm.mg",
    "ac.mu", "co.mu", "com.mu", "gov.mu", "net.mu", "or.mu", "org.mu",
    "com.sc", "edu.sc", "gov.sc", "net.sc", "org.sc",
    # West / Central / East Africa
    "com.ci", "co.ci", "ed.ci", "edu.ci", "go.ci", "gouv.ci", "int.ci",
    "net.ci", "or.ci", "org.ci",
    "art.sn", "com.sn", "edu.sn", "gouv.sn", "org.sn", "perso.sn",
    "univ.sn",
    "ac.gn", "com.gn", "gov.gn", "net.gn", "org.gn",
    "com.lr", "edu.lr", "gov.lr", "net.lr", "org.lr",
    "com.sl", "edu.sl", "gov.sl", "net.sl", "org.sl",
    "com.ly", "edu.ly", "gov.ly", "id.ly", "med.ly", "net.ly",
    "org.ly", "plc.ly", "sch.ly",
    "com.sd", "edu.sd", "gov.sd", "info.sd", "med.sd", "net.sd",
    "org.sd", "tv.sd",
    "com.so", "edu.so", "gov.so", "me.so", "net.so", "org.so",
    "biz.ss", "com.ss", "edu.ss", "gov.ss", "me.ss", "net.ss",
    "org.ss", "sch.ss",
    "co.cm", "com.cm", "gov.cm", "net.cm",
    "gov.bf", "gouv.bj",
    "com.ml", "edu.ml", "gouv.ml", "gov.ml", "net.ml", "org.ml",
    "presse.ml",
    # Middle East (rest)
    "com.bh", "edu.bh", "gov.bh", "net.bh", "org.bh",
    "com.iq", "edu.iq", "gov.iq", "mil.iq", "net.iq", "org.iq",
    # South / Central Asia (rest)
    "com.af", "edu.af", "gov.af", "net.af", "org.af",
    "com.mv", "edu.mv", "gov.mv", "net.mv", "org.mv",
    "com.bt", "edu.bt", "gov.bt", "net.bt", "org.bt",
    "com.la", "edu.la", "gov.la", "info.la", "int.la", "net.la",
    "org.la", "per.la",
    "com.mn", "edu.mn", "gov.mn", "nyc.mn", "org.mn",
    "com.bn", "edu.bn", "gov.bn", "net.bn", "org.bn",
    # Pacific
    "ac.fj", "biz.fj", "com.fj", "gov.fj", "info.fj", "mil.fj",
    "name.fj", "net.fj", "org.fj", "pro.fj",
    "com.sb", "edu.sb", "gov.sb", "net.sb", "org.sb",
    "com.vu", "edu.vu", "net.vu", "org.vu",
    "com.ws", "edu.ws", "gov.ws", "net.ws", "org.ws",
    "biz.ki", "com.ki", "edu.ki", "gov.ki", "info.ki", "net.ki",
    "org.ki",
    "biz.nr", "com.nr", "edu.nr", "gov.nr", "info.nr", "net.nr",
    "org.nr",
    "com.to", "edu.to", "gov.to", "mil.to", "net.to", "org.to",
    "arts.nf", "com.nf", "firm.nf", "info.nf", "net.nf", "other.nf",
    "per.nf", "rec.nf", "store.nf", "web.nf",
    "gov.as", "gov.cx",
    "com.gu", "edu.gu", "gov.gu", "guam.gu", "info.gu", "net.gu",
    "org.gu", "web.gu",
    # Caribbean / Atlantic
    "com.ag", "co.ag", "net.ag", "nom.ag", "org.ag",
    "biz.bb", "co.bb", "com.bb", "edu.bb", "gov.bb", "info.bb",
    "net.bb", "org.bb", "store.bb", "tv.bb",
    "com.bs", "edu.bs", "gov.bs", "net.bs", "org.bs",
    "com.bz", "edu.bz", "gov.bz", "net.bz", "org.bz",
    "com.dm", "edu.dm", "gov.dm", "net.dm", "org.dm",
    "com.gd", "edu.gd", "gov.gd", "net.gd", "org.gd",
    "adult.ht", "art.ht", "asso.ht", "com.ht", "coop.ht", "edu.ht",
    "firm.ht", "gouv.ht", "info.ht", "med.ht", "net.ht", "org.ht",
    "perso.ht", "pol.ht", "pro.ht", "rel.ht", "shop.ht",
    "co.lc", "com.lc", "edu.lc", "gov.lc", "net.lc", "org.lc",
    "com.vc", "edu.vc", "gov.vc", "mil.vc", "net.vc", "org.vc",
    "biz.tt", "co.tt", "com.tt", "edu.tt", "gov.tt", "info.tt",
    "name.tt", "net.tt", "org.tt", "pro.tt",
    "co.gy", "com.gy", "edu.gy", "gov.gy", "net.gy", "org.gy",
    "com.ky", "edu.ky", "gov.ky", "net.ky", "org.ky",
    "com.bm", "edu.bm", "gov.bm", "net.bm", "org.bm",
    "com.ai", "net.ai", "off.ai", "org.ai",
    "com.aw", "com.cw", "edu.cw", "net.cw", "org.cw", "gov.sx",
    "ac.pr", "biz.pr", "com.pr", "edu.pr", "est.pr", "gov.pr",
    "info.pr", "isla.pr", "name.pr", "net.pr", "org.pr", "pro.pr",
    "prof.pr",
    "co.vi", "com.vi", "k12.vi", "net.vi", "org.vi",
    "com.cu", "edu.cu", "gov.cu", "inf.cu", "net.cu", "org.cu",
    "com.sv", "edu.sv", "gob.sv", "org.sv", "red.sv",
    "com.ni", "edu.ni", "gob.ni", "net.ni", "org.ni",
    "com.hn", "edu.hn", "gob.hn", "mil.hn", "net.hn", "org.hn",
    "abo.pa", "ac.pa", "com.pa", "edu.pa", "gob.pa", "ing.pa",
    "med.pa", "net.pa", "nom.pa", "org.pa", "sld.pa",
    # Small-island / special registries
    "com.fm", "edu.fm", "net.fm", "org.fm",
    "com.gi", "edu.gi", "gov.gi", "ltd.gi", "mod.gi", "org.gi",
    "co.gl", "com.gl", "edu.gl", "net.gl", "org.gl",
    "com.mo", "edu.mo", "gov.mo", "net.mo", "org.mo",
    "asso.mc", "tm.mc", "nom.ad",
    "com.sh", "gov.sh", "mil.sh", "net.sh", "org.sh",
    "com.ac", "edu.ac", "gov.ac", "mil.ac", "net.ac", "org.ac",
    "com.tc", "gov.tc", "net.tc", "org.tc", "pro.tc",
    "com.ms", "edu.ms", "gov.ms", "net.ms", "org.ms",
    "asso.re", "com.re",
    "co.st", "com.st", "edu.st", "mil.st", "net.st", "org.st",
    "principe.st", "saotome.st", "store.st",
    "com.cv", "edu.cv", "int.cv", "net.cv", "nome.cv", "org.cv",
    "publ.cv",
    "com.io", "com.gp", "edu.gp", "org.gp", "net.gp", "asso.gp",
    "mobi.gp",
    # United States: state namespaces + DC
    "al.us", "ak.us", "az.us", "ar.us", "ca.us", "co.us", "ct.us",
    "dc.us", "de.us", "fl.us", "ga.us", "hi.us", "ia.us", "id.us",
    "il.us", "in.us", "ks.us", "ky.us", "la.us", "ma.us", "md.us",
    "me.us", "mi.us", "mn.us", "mo.us", "ms.us", "mt.us", "nc.us",
    "nd.us", "ne.us", "nh.us", "nj.us", "nm.us", "nv.us", "ny.us",
    "oh.us", "ok.us", "or.us", "pa.us", "ri.us", "sc.us", "sd.us",
    "tn.us", "tx.us", "ut.us", "va.us", "vt.us", "wa.us", "wi.us",
    "wv.us", "wy.us",
    # Canada: provinces/territories + federal
    "ab.ca", "bc.ca", "gc.ca", "mb.ca", "nb.ca", "nf.ca", "nl.ca",
    "ns.ca", "nt.ca", "nu.ca", "on.ca", "pe.ca", "qc.ca", "sk.ca",
    "yk.ca",
)
# fmt: on

# SQL literal list for DuckDB oracles — interpolated from the SAME
# tuple so operator and oracle can never drift.
SUFFIX_SQL_LIST = ", ".join(f"'{s}'" for s in TWO_LEVEL_SUFFIXES)
