#!/bin/bash
# Regenerate named query sections of PLANS.md in place.
# Usage: tools/replans.sh name1,name2,...
set -euo pipefail
cd "$(dirname "$0")/.."
NAMES="$1"
OUT=$(mktemp)
sbt -batch "runMain graft.Explain /root/testdata/sf0.1 $NAMES" 2>/dev/null \
  | sed -n '/^##########/,$p' > "$OUT"
python3 - "$OUT" "$NAMES" <<'EOF'
import sys, re
fresh = open(sys.argv[1]).read()
names = sys.argv[2].split(',')
md = open('PLANS.md').read()
def sections(text):
    parts = re.split(r'(?m)^########## (\S+) ##########\n', text)
    # parts: [prefix, name1, body1, name2, body2, ...]
    return parts[0], {parts[i]: parts[i+1] for i in range(1, len(parts), 2)}
_, freshsec = sections(fresh)
prefix, mdsec = sections(md)
for n in names:
    if n not in freshsec:
        sys.exit(f'no fresh plan for {n}')
    mdsec[n] = freshsec[n]
out = prefix + ''.join(f'########## {k} ##########\n{v}' for k, v in mdsec.items())
open('PLANS.md', 'w').write(out)
print('spliced:', ', '.join(names))
EOF
rm -f "$OUT"
