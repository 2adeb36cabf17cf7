#!/usr/bin/env python3
"""Regenerate the SURVEY.md query-id index table (section 2.25).

The per-round SURVEY addenda (sections 2.12-2.24) grew to dominate the
file; this table is the compact, machine-derived replacement for future
growth: one row per graded query, derived from the registration sites in
src/main (the `"qNNN_name" -> (fn _)` maps every operator file exports)
joined with the ORACLE registration sites (the `"qNNN_name" -> ...Sql`
entries of each file's oracles map — r19, so the audit trail from query
to replay text is one table) and the most recent CORRECTNESS_r*.json.
Run from the repo root:

    python3 tools/gen_query_index.py

Rewrites everything between the GEN-QUERY-INDEX markers in SURVEY.md.
"""
import json, os, re, glob, sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QNAME = re.compile(r'"(q\d+[a-z0-9_]*)"\s*->')


def sites():
    """(query -> registration rel:line, query -> oracle rel:line).

    A `"name" -> ...` occurrence is an ORACLE site when the mapped
    expression mentions a *Sql text (oracle builders end in Sql by
    convention); otherwise it is the query registration. First hit of
    each kind wins — wrapper lambdas still point at the defining file.
    """
    regs, oracles = {}, {}
    for path in sorted(glob.glob(os.path.join(ROOT, 'src/main/scala/**/*.scala'),
                                 recursive=True)):
        rel = os.path.relpath(path, ROOT)
        lines = open(path, encoding='utf-8').read().splitlines()
        for i, line in enumerate(lines):
            for m in QNAME.finditer(line):
                name = m.group(1)
                # the mapped expression may continue on the next lines
                tail = line[m.end():] + ' ' + ' '.join(lines[i + 1:i + 3])
                is_oracle = re.match(r'[^,}]*Sql', tail) is not None
                target = oracles if is_oracle else regs
                target.setdefault(name, f'{rel}:{i + 1}')
    return regs, oracles


def latest_correctness():
    files = sorted(glob.glob(os.path.join(ROOT, 'CORRECTNESS_r*.json')),
                   key=lambda p: int(re.search(r'r(\d+)', p).group(1)))
    if not files:
        return {}, 'none'
    path = files[-1]
    data = json.load(open(path))
    status = {}
    for name, rec in data.items():
        if not isinstance(rec, dict):
            continue
        ok = rec.get('rows_match') and rec.get('schema_match') and \
             rec.get('hash_match') and not rec.get('err')
        status[name] = 'pass' if ok else 'FAIL'
    return status, os.path.basename(path)


def main():
    regs, oracles = sites()
    status, src = latest_correctness()
    def qnum(name):
        return int(re.match(r'q(\d+)', name).group(1))
    rows = sorted(regs.items(), key=lambda kv: (qnum(kv[0]), kv[0]))
    lines = []
    lines.append('<!-- GEN-QUERY-INDEX:BEGIN (tools/gen_query_index.py) -->')
    lines.append('### 2.25 Generated query index (regenerate with '
                 '`python3 tools/gen_query_index.py`)')
    lines.append('')
    lines.append(f'One row per graded query: id, defining file:line (the '
                 f'registration site), the oracle registration site (the '
                 f'`*Sql` entry; "shared" = the oracle text is registered '
                 f'under another query\'s entry or composed inline), and '
                 f'its gate status in `{src}` '
                 f'("new" = added after that artifact). '
                 f'{len(rows)} queries registered.')
    lines.append('')
    lines.append('| query | registration | oracle | gate |')
    lines.append('|---|---|---|---|')
    for name, rel in rows:
        st = status.get(name, 'new')
        osite = oracles.get(name, 'shared')
        osite = f'`{osite}`' if osite != 'shared' else osite
        lines.append(f'| {name} | `{rel}` | {osite} | {st} |')
    lines.append('<!-- GEN-QUERY-INDEX:END -->')
    block = '\n'.join(lines)
    survey = os.path.join(ROOT, 'SURVEY.md')
    txt = open(survey, encoding='utf-8').read()
    begin = '<!-- GEN-QUERY-INDEX:BEGIN'
    if begin in txt:
        pre = txt[:txt.index(begin)]
        rest = txt[txt.index('<!-- GEN-QUERY-INDEX:END -->') +
                   len('<!-- GEN-QUERY-INDEX:END -->'):]
        txt = pre + block + rest
    else:
        # insert before section 3 so the addenda stop growing above it
        anchor = '## 3. Query lifecycle'
        txt = txt.replace(anchor, block + '\n\n' + anchor, 1)
    open(survey, 'w', encoding='utf-8').write(txt)
    n_oracle = sum(1 for name, _ in rows if name in oracles)
    print(f'wrote {len(rows)} rows, {n_oracle} with oracle sites '
          f'(status source: {src})')


if __name__ == '__main__':
    main()
