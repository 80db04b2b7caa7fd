import re, subprocess, itertools, os

SRC = "/tmp/stemtool/libstemmer_c/src_c"
TOOL = "/tmp/stemtool/libstemmer_c/stemwords"
OUT = "/root/repo/src/test/resources/snowball"
os.makedirs(OUT, exist_ok=True)

def extract_strings(cfile):
    text = open(cfile, 'rb').read().decode('latin1')
    out = set()
    for m in re.finditer(r'static const symbol s(?:_\d+_\d+|_\d+)\[\d*\] = \{([^}]*)\}', text):
        items = [x.strip() for x in m.group(1).split(',') if x.strip()]
        bs = bytearray()
        ok = True
        for it in items:
            if it.startswith("'"):
                inner = it[1:-1]
                if inner.startswith('\\'): inner = inner[1]
                bs.append(ord(inner))
            elif it.startswith('0x') or it.startswith('0X'):
                bs.append(int(it, 16))
            elif it.lstrip('-').isdigit():
                v = int(it)
                if 0 <= v < 256: bs.append(v)
                else: ok = False
            else: ok = False
        if not ok: continue
        try:
            s = bs.decode('utf-8')
            if s: out.add(s)
        except UnicodeDecodeError: pass
    return out

# generic roots + language-flavored roots (cover vowel/consonant patterns,
# short/long, double consonants, vowel-final)
base_roots = """b bo bok bokk hus huse kvind kvinde løb løbe stor store hemmelig
frisk friskhet het givet gyldig magt und unders over tal tale tael
nation national gener generat commun communic arsen arsenal
run runn hop hopp stop red redd blu blue free tree agree
argu argum conform radic valenc assocconverg
cas cant cantar habl habla amig amigo libro perr perro
mang mangi parl parla bell bella ross rosso citt
cas casa fal fala menin menino livr livro
tal tala hus huset stor stora vack vacker
kirk kirke vind vindu gut gutt jent jente
kala kalas talo talossa ystäv ystävä
merg merge maşin maşina frumos frumoas
ház házak ember emberek szép szépen
ev evler araba arabalar güzel güzell kitap kitapları""".split()

extra = ["xyzzy", "a", "ab", "abc", "y", "ya", "oy", "eye", "ey",
         "skis", "sky", "dying", "lying", "tying", "idly", "gently",
         "ugly", "early", "only", "singly", "news", "howe", "atlas",
         "cosmos", "bias", "andes", "inning", "outing", "canning",
         "herring", "earring", "proceed", "exceed", "succeed",
         "generously", "generation", "generic", "communism", "arsenic"]

langs = {
 "english":"stem_UTF_8_english.c", "danish":"stem_UTF_8_danish.c",
 "norwegian":"stem_UTF_8_norwegian.c", "swedish":"stem_UTF_8_swedish.c",
 "spanish":"stem_UTF_8_spanish.c", "italian":"stem_UTF_8_italian.c",
 "portuguese":"stem_UTF_8_portuguese.c", "finnish":"stem_UTF_8_finnish.c",
 "romanian":"stem_UTF_8_romanian.c", "hungarian":"stem_UTF_8_hungarian.c",
 "turkish":"stem_UTF_8_turkish.c", "german":"stem_UTF_8_german.c",
 "dutch":"stem_UTF_8_dutch.c", "french":"stem_UTF_8_french.c",
 "russian":"stem_UTF_8_russian.c",
}

# language-flavored roots for the second wave
base_roots += """haus häuser kind kinder schön schöner groß grosse lauf laufen
aufeinander getan gebildet verbindung zufriedenheit
fiets fietsen huis huizen mooi mooie lopend gelopen heid heden lichamelijk
maison maisons beau belle courir couru manger mangé étudi étudiant
logement important frapp frappé copi copier vétu yeux
дом дома книг книга красив красивый бега бегать важн важность
петь пела голос голоса""".split()

for lang, cf in langs.items():
    sufs = sorted(extract_strings(os.path.join(SRC, cf)))
    words = set(extra)
    words.update(base_roots)
    words.update(sufs)
    for r in base_roots:
        for s in sufs:
            words.add(r + s)
    # chained suffixes on a few roots to hit multi-step paths
    small = [s for s in sufs if len(s) <= 6][:40]
    for r in base_roots[:12]:
        for s1, s2 in itertools.product(small[:20], small[:20]):
            words.add(r + s1 + s2)
    words = sorted({w.lower() for w in words if w and len(w) < 40})
    inp = "\n".join(words) + "\n"
    res = subprocess.run([TOOL, "-l", lang, "-c", "UTF_8"],
                         input=inp.encode("utf-8"), capture_output=True)
    stems = res.stdout.decode("utf-8").splitlines()
    assert len(stems) == len(words), (lang, len(stems), len(words))
    with open(f"{OUT}/{lang}.tsv", "w", encoding="utf-8") as f:
        for w, s in zip(words, stems):
            f.write(f"{w}\t{s}\n")
    print(lang, len(words))
