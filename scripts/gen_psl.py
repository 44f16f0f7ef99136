header = """// Public-suffix rules in the REAL publicsuffix.org list format:
// one rule per line, '//' comments, '*.' wildcard rules (the '*'
// matches exactly one label), '!' exception rules (override a
// wildcard; the public suffix is the rule minus its leftmost label).
// This is a genuine ~880-rule SUBSET of the list (no egress in this
// build environment to fetch all ~9k entries); the PARSER and the
// matching algorithm (graft.text.Urls.registrableDomainsPsl) implement
// the complete format + prevailing-rule semantics, so production
// swaps in the full downloaded file unchanged.
// ===BEGIN ICANN DOMAINS===
"""
icann = []
# generic TLDs (explicit, as in the real list)
icann += ["com", "org", "net", "edu", "gov", "mil", "int", "info", "biz",
          "name", "io", "co", "me", "tv", "cc", "app", "dev", "xyz", "ai"]
# uk
icann += ["uk"] + [f"{s}.uk" for s in
          "ac co gov ltd me net nhs org plc police sch".split()]
# jp: second-levels + all 47 prefectures + city wildcard/exception demo
icann += ["jp"] + [f"{s}.jp" for s in "ac ad co ed go gr lg ne or".split()]
prefs = ("aichi akita aomori chiba ehime fukui fukuoka fukushima gifu gunma "
         "hiroshima hokkaido hyogo ibaraki ishikawa iwate kagawa kagoshima "
         "kanagawa kochi kumamoto kyoto mie miyagi miyazaki nagano nagasaki "
         "nara niigata oita okayama okinawa osaka saga saitama shiga shimane "
         "shizuoka tochigi tokushima tokyo tottori toyama wakayama yamagata "
         "yamaguchi yamanashi").split()
icann += [f"{p}.jp" for p in prefs]
icann += ["*.kawasaki.jp", "*.kitakyushu.jp", "*.kobe.jp", "*.nagoya.jp",
          "*.sapporo.jp", "*.sendai.jp", "*.yokohama.jp",
          "!city.kawasaki.jp", "!city.kitakyushu.jp", "!city.kobe.jp",
          "!city.nagoya.jp", "!city.sapporo.jp", "!city.sendai.jp",
          "!city.yokohama.jp"]
# au / nz
icann += ["au"] + [f"{s}.au" for s in "com net org edu gov asn id".split()]
icann += ["nz"] + [f"{s}.nz" for s in
          "ac co geek gen govt kiwi maori net org school".split()]
# the canonical wildcard TLD + exception (Cook Islands)
icann += ["*.ck", "!www.ck"]
# other wildcard TLDs from the real list
icann += ["*.bd", "*.er", "*.fk", "*.jm", "*.kh", "*.mm", "*.np", "*.pg"]
# common ccTLD registries
cc = {
  "br": "com net org gov edu mil art blog eco emp far inf rec srv tmp",
  "cn": "com net org gov edu ac mil",
  "in": "co net org firm gen ind ac edu gov res nic",
  "za": "co net org web ac gov edu law mil nom",
  "kr": "co or ne re go pe ac hs ms es sc kg mil",
  "tw": "com org net edu gov idv club ebiz game",
  "hk": "com org net edu gov idv",
  "sg": "com org net edu gov per",
  "th": "co or ac go in mi net",
  "id": "co or ac go web sch net mil biz my",
  "my": "com net org gov edu mil name",
  "ph": "com net org gov edu ngo mil i",
  "vn": "com net org gov edu ac biz info name pro health int",
  "il": "co org net ac gov muni k12 idf",
  "tr": "com net org gov edu av bbs bel biz dr gen info k12 name pol tel web",
  "mx": "com net org gob edu",
  "ar": "com net org gob edu int mil musica tur",
  "eg": "com net org gov edu eun mil name sci",
  "sa": "com net org gov edu med pub sch",
  "pk": "com net org gov edu biz fam gob gok gon gop gos web",
  "ng": "com net org gov edu i mil mobi name sch",
  "ke": "co or ne go ac sc me mobi info",
  "gh": "com org gov edu mil",
  "tz": "co ac go hotel info me mil mobi ne or sc tv",
  "ug": "co or ac sc go ne com org",
  "ua": "com net org gov edu in",
  "pl": "com net org edu gov mil biz info waw",
  "ru": "com net org gov edu int mil ac",
  "it": "gov edu",
  "fr": "gouv asso com nom prd tm",
  "es": "com nom org gob edu",
  "pt": "com net org gov edu int nome publ",
  "gr": "com net org gov edu",
  "ro": "com org tm nt nom info rec arts firm store www",
  "cz": "",
  "at": "ac co gv or",
  "ch": "",
  "be": "ac",
  "nl": "",
  "se": "a b c d e f g h i k l m n o p r s t u w x y z ac org",
  "no": "",
  "dk": "",
  "fi": "aland",
  "hu": "co org priv",
  "lk": "com org edu ngo soc web ltd assn grp hotel ac gov sch net int",
  "bt": "com net org gov edu",
  "kz": "com net org gov edu mil",
  "uz": "com co net org",
  "ae": "co net org gov ac sch mil pro",
  "qa": "com net org gov edu mil name sch",
  "kw": "com net org gov edu emb ind",
  "om": "com net org gov edu med museum pro co",
  "jo": "com net org gov edu sch mil name",
  "lb": "com net org gov edu",
  "ma": "co net org gov ac press",
  "tn": "com net org gov ens fin ind info intl mincom nat",
  "dz": "com net org gov edu asso art pol",
}
for tld, seconds in cc.items():
    icann.append(tld)
    icann += [f"{s}.{tld}" for s in seconds.split()]
# ca provinces
icann += ["ca"] + [f"{p}.ca" for p in
          "ab bc mb nb nf nl ns nt nu on pe qc sk yk gc".split()]
# us: states + k12/cc/lib under each (the real list's structure)
states = ("ak al ar az ca co ct dc de fl ga hi ia id il in ks ky la ma md me "
          "mi mn mo ms mt nc nd ne nh nj nm nv ny oh ok or pa pr ri sc sd tn "
          "tx ut va vi vt wa wi wv wy").split()
icann += ["us"] + [f"{st}.us" for st in states]
icann += [f"{kind}.{st}.us" for st in states for kind in ("k12", "cc", "lib")]

private_hdr = "// ===END ICANN DOMAINS===\n// ===BEGIN PRIVATE DOMAINS===\n"
private = ["github.io", "githubusercontent.com", "gitlab.io",
           "blogspot.com", "blogspot.co.uk", "blogspot.com.au",
           "blogspot.com.br", "blogspot.de", "blogspot.fr", "blogspot.in",
           "blogspot.jp", "blogspot.mx", "blogspot.kr",
           "appspot.com", "herokuapp.com", "netlify.app", "vercel.app",
           "pages.dev", "workers.dev", "web.app", "firebaseapp.com",
           "azurewebsites.net", "cloudapp.net", "cloudfront.net",
           "s3.amazonaws.com", "wordpress.com", "weebly.com", "wixsite.com",
           "neocities.org", "readthedocs.io", "onrender.com", "fly.dev",
           "glitch.me", "repl.co", "surge.sh", "fastly-edge.com",
           "b-cdn.net", "pythonanywhere.com", "ngrok.io"]
# blogspot needs com.au/com.br seconds present above; fine.
footer = "// ===END PRIVATE DOMAINS===\n"

seen = set()
lines = []
for r in icann + private:
    if r not in seen:
        seen.add(r); lines.append(r)
out = header + "\n".join(icann) + "\n" + private_hdr + "\n".join(private) + "\n" + footer
open("/tmp/public_suffix_subset.dat", "w").write(out)
rules = [l for l in out.splitlines() if l and not l.startswith("//")]
print(len(rules), "rules;", len([r for r in rules if r.startswith('*.')]), "wildcards;",
      len([r for r in rules if r.startswith('!')]), "exceptions;",
      "max labels:", max(len(r.lstrip('!').lstrip('*.').split('.')) + (1 if r.startswith('*.') else 0) for r in rules))
print("dupes:", len(rules) - len(set(rules)))
