import re, sys
f = sys.argv[1]
text = open(f,'rb').read().decode('latin1')
syms={}
for sm in re.finditer(r'static const symbol (s_\d+_\d+)\[\d+\] = \{([^}]*)\}', text):
    items=[x.strip() for x in sm.group(2).split(',') if x.strip()]
    bs=bytearray()
    for it in items:
        if it.startswith("'"):
            inner=it[1:-1]
            if inner.startswith('\\'): inner=inner[1]
            bs.append(ord(inner))
        elif it.startswith('0x'): bs.append(int(it,16))
        elif it.lstrip('-').isdigit(): bs.append(int(it))
    try: syms[sm.group(1)]=bs.decode('utf-8')
    except: syms[sm.group(1)]='?'
for m in re.finditer(r'static const struct among a_(\d+)\[\d+\] =\s*\{(.*?)\};', text, re.S):
    rows=re.findall(r'\{\s*(\d+),\s*(s_\d+_\d+|0),\s*(-?\d+),\s*(-?\d+),\s*\d+\}', m.group(2))
    print(f"a_{m.group(1)}:", [(syms.get(r[1],''), r[3]) for r in rows])
# groupings
for gm in re.finditer(r'static const unsigned char (g_\w+)\[\] = \{([^}]*)\}', text):
    print(gm.group(1), [x.strip() for x in gm.group(2).split(',')])
# function names give step structure
print([m for m in re.findall(r'static int r_(\w+)\(', text)])
