# Runs the reference implementation (pure Python) to produce golden values
# for the Scala bit-parity suite. Emits src/test/resources/goldens.json.
import sys, json, hashlib
sys.path.insert(0, '/root/reference/HLL')
from HyperLogLog import HyperLogLog, HyperLogLog64

def regs(h): return [(i, v) for i, v in enumerate(h.hmap) if v > 0]
def regs_sha(h):
    return hashlib.sha1(bytes(h.hmap)).hexdigest()

g = {}
data = ['abc', 'def', 'ghi']
num_data = [11, 11.717, 12.207, 12.7896, 11]
colliding = [654941.845, 400.2024]

h = HyperLogLog(250); h.append('abc'); g['regs_abc_k250_32'] = regs(h)
h = HyperLogLog(250); h.extend(data); g['regs_data_k250_32'] = regs(h)
g['card_data_k250_32'] = h.cardinality
h64 = HyperLogLog64(2**17); h64.extend(data); g['card_data_k2p17_64'] = h64.cardinality
h = HyperLogLog(250); h.extend(num_data); g['regs_num_k250_32'] = regs(h)
h = HyperLogLog(250); h.append(colliding[0]); h.append(colliding[1])
g['regs_collide_k250_32'] = regs(h)

items = json.load(open('/root/reference/tests/HLL/data.txt'))
lists = json.load(open('/root/reference/tests/HLL/data2.txt'))

h64 = HyperLogLog64(2**12); h64.extend(items)
g['card_datatxt_k2p12_64'] = h64.cardinality           # 645.2579301443818
g['regssha_datatxt_k2p12_64'] = regs_sha(h64)
h = HyperLogLog(250); h.extend(items); g['card_datatxt_k250_32'] = h.cardinality
h = HyperLogLog(2**12); h.extend(items); g['card_datatxt_k2p12_32'] = h.cardinality
h64b = HyperLogLog64(2**17); h64b.extend(items); g['card_datatxt_k2p17_64'] = h64b.cardinality

# distributed: one sketch per inner list, merged (reference examples.py:56-67)
parts = []
for sub in lists:
    hh = HyperLogLog64(2**12); hh.extend(sub); parts.append(hh)
tot = parts[0]
for hh in parts[1:]:
    tot = tot + hh
g['card_data2_union_k2p12_64'] = tot.cardinality        # 2875.28999...
g['regssha_data2_union_k2p12_64'] = regs_sha(tot)

# synthetic sweep: strings u0..u{n}, several k, both widths
for k, bits, n in [(16, 32, 100), (250, 32, 5000), (2**12, 32, 20000),
                   (2**16, 32, 50000), (16, 64, 100), (250, 64, 5000),
                   (2**12, 64, 20000), (2**14, 64, 50000), (2**18, 64, 50000)]:
    cls = HyperLogLog if bits == 32 else HyperLogLog64
    hh = cls(k)
    for i in range(n):
        hh.append('u%d' % i)
    g['card_sweep_k%d_%d_n%d' % (k, bits, n)] = hh.cardinality
    g['regssha_sweep_k%d_%d_n%d' % (k, bits, n)] = regs_sha(hh)

json.dump(g, open('/root/repo/src/test/resources/goldens.json', 'w'), indent=1)
print(json.dumps({k: v for k, v in g.items() if k.startswith('card')}, indent=1))

# float-input parity: Python str() renderings + an end-to-end sketch over a
# float column (exercises the engine's python_str coercion for doubles)
float_fixture = [0.1, 1.5, 400.2024, 654941.845, 12345678.0, 1e16, 1.5e16,
                 1e-4, 9.999e-5, 5e-324, 1.7976931348623157e308, -0.0, 2.0,
                 -273.15, 6.02214076e23, 3.141592653589793, 1e15, 123456789.123]
g2 = json.load(open('/root/repo/src/test/resources/goldens.json'))
g2['pystr_fixture'] = [str(x) for x in float_fixture]
h64 = HyperLogLog64(2**12)
h64.extend(float_fixture)
g2['card_floats_k2p12_64'] = h64.cardinality
g2['regssha_floats_k2p12_64'] = regs_sha(h64)
json.dump(g2, open('/root/repo/src/test/resources/goldens.json', 'w'), indent=1)
print('floats:', g2['pystr_fixture'], g2['card_floats_k2p12_64'])
