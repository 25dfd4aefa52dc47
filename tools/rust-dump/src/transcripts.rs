//! Full scheme-level protocol transcripts from the Rust reference:
//! keygen -> encrypt -> bootstrap/gate/mul -> decrypt, with every key,
//! ciphertext, and plaintext dumped for bit-level parity checks against the
//! JAX implementation (tests/test_rust_transcripts.py).
//!
//! The reference scheme APIs sample through `impl RngCore`
//! (`scheme/fhew/src/lwe.rs:103-106`, `rlwe.rs:146-170`, `ckks.rs:215-239`),
//! so everything is driven by the deterministic SplitMix64-backed RngCore
//! below. Key material the scheme structs keep private (`BootstrappingKey`'s
//! `ksk/brk/ak` accessors are private, `fhew/src/bootstrapping.rs:101-113`)
//! is recovered by REPLAY: a cloned RNG repeats the exact public sub-call
//! sequence of the official key_gen (`bootstrapping.rs:121-146`), whose
//! sampled objects are therefore byte-identical to the official key's
//! internals; the few constructors that are pub(crate)-gated
//! (`RgswPlaintext`, `TggswPlaintext`) are replicated inline from their
//! cited bodies using only public `util` ops. End-to-end gate/bootstrap
//! output parity (assert-checked against decrypts in here, bit-checked in
//! the pytest) validates the replayed material transitively.

use std::path::Path;

use rand::RngCore;
use util::{
    binary, dg, tdg, zo, AVec, Base2Decomposor, BigInt, Rq, RnsRq, Rt, Zq, C256, F256, T64, X,
};

use ckks::ckks::{Ckks, CkksParam};
use fhew::bootstrapping::{Bootstrapping as FhewBootstrapping, BootstrappingKey as FhewBootKey,
    BootstrappingParam as FhewBootParam};
use fhew::fhew::Fhew;
use fhew::lwe::{Lwe, LweCiphertext, LweParam};
use fhew::rgsw::RgswParam;
use fhew::rlwe::{Rlwe, RlweParam};
use tfhe::bootstrapping::{Bootstrapping as TfheBootstrapping, BootstrappingParam as TfheBootParam};
use tfhe::tggsw::{Tggsw, TggswParam};
use tfhe::tlwe::{Tlwe, TlweCiphertext, TlweParam};

use crate::{write_npy_f64, write_npy_u64, SplitMix64};

// -- SplitMix64 as a rand::RngCore -------------------------------------------
//
// Only determinism matters (the Python side never re-derives the stream; it
// reads the dumped artifacts), but the stream is probed into *_rng_probe.npy
// so a future regeneration can confirm seed alignment.

#[derive(Clone)]
pub struct SplitMixRng(pub SplitMix64);

impl SplitMixRng {
    fn new(seed: u64) -> Self {
        SplitMixRng(SplitMix64(seed))
    }
}

impl RngCore for SplitMixRng {
    fn next_u32(&mut self) -> u32 {
        (self.0.next() >> 32) as u32
    }

    fn next_u64(&mut self) -> u64 {
        self.0.next()
    }

    fn fill_bytes(&mut self, dest: &mut [u8]) {
        for chunk in dest.chunks_mut(8) {
            let v = self.0.next().to_le_bytes();
            chunk.copy_from_slice(&v[..chunk.len()]);
        }
    }

    fn try_fill_bytes(&mut self, dest: &mut [u8]) -> Result<(), rand::Error> {
        self.fill_bytes(dest);
        Ok(())
    }
}

const SEED_FHEW: u64 = 0xF4E_2026_0817;
const SEED_TFHE: u64 = 0x7F4E_2026_0817;
const SEED_CKKS: u64 = 0xCC5_2026_0817;

fn probe(dir: &Path, tag: &str, seed: u64) {
    let mut r = SplitMixRng::new(seed);
    let v: Vec<u64> = (0..4).map(|_| r.next_u64()).collect();
    write_npy_u64(&dir.join(format!("{tag}_rng_probe.npy")), &[4], &v);
}

fn rq_u64(r: &Rq) -> Vec<u64> {
    r.iter().map(|z| z.to_u64()).collect()
}

fn rt_u64(r: &Rt) -> Vec<u64> {
    r.iter().map(|t| t.to_u64()).collect()
}

fn avec_i64_u64(v: &AVec<i64>) -> Vec<u64> {
    v.iter().map(|&x| x as u64).collect()
}

// -- FHEW: NAND/AND/OR/XOR gate transcript at the single-key fixture ---------
//
// Fixture: `scheme/fhew/src/fhew/boolean.rs:225-239` — rgsw (log_q=28,
// log_n=9, log_b=7, d=4), lwe_s (n=100, q=2^16, log_b=4, d=4), w=10.
// The JAX FHEW pipeline follows the reference op-for-op (exact integer
// arithmetic end to end), so gate outputs must match BIT-EXACTLY.

pub fn dump_fhew(dir: &Path) {
    probe(dir, "fhew", SEED_FHEW);
    let p = 4u64;
    let (log_q, log_n, log_b, d) = (28usize, 9usize, 7usize, 4usize);
    let q = util::two_adic_primes(log_q, log_n + 1).next().unwrap();
    let rlwe = RlweParam::new(q, p, log_n).with_decomposor(log_b, d);
    let rgsw = RgswParam::new(rlwe, log_b, d);
    let (n_s, q_s, log_b_s, d_s) = (100usize, 1u64 << 16, 4usize, 4usize);
    let lwe_s = LweParam::new(q_s, p, n_s).with_decomposor(log_b_s, d_s);
    let param = FhewBootParam::new(rgsw, lwe_s, 10);
    let n = param.n(); // 512

    let mut rng = SplitMixRng::new(SEED_FHEW);

    // z: the RLWE/LWE_z secret key (`rlwe.rs:93-95`: dg(3.2, 6) of len n)
    let mut z_fork = rng.clone();
    let z = Rlwe::sk_gen(param.rlwe(), &mut rng);
    let z_raw: AVec<i64> = AVec::sample(n, dg(3.2, 6), &mut z_fork);
    write_npy_u64(&dir.join("fhew_sk_z.npy"), &[n], &avec_i64_u64(&z_raw));

    // Official keygen, and a replay clone that repeats its exact sub-call
    // sequence (`bootstrapping.rs:121-146`: s, ksk, brk, ak).
    let mut kg = rng.clone();
    let bk = FhewBootstrapping::key_gen(&param, &z, &mut rng);

    let mut s_fork = kg.clone();
    let s = Lwe::sk_gen(param.lwe_s(), &mut kg);
    let s_raw: AVec<i64> = AVec::sample(n_s, dg(3.2, 6), &mut s_fork);
    write_npy_u64(&dir.join("fhew_sk_s.npy"), &[n_s], &avec_i64_u64(&s_raw));

    // ksk: n*d_s LWE cts under s (`lwe.rs:108-119`, pub ksk_gen)
    let ksk = Lwe::ksk_gen(param.lwe_s(), &s, &z, &mut kg);
    let mut ksk_a = Vec::with_capacity(n * d_s * n_s);
    let mut ksk_b = Vec::with_capacity(n * d_s);
    for a in ksk.a() {
        ksk_a.extend(a.iter().map(|v| v.to_u64()));
    }
    for b in ksk.b() {
        ksk_b.push(b.to_u64());
    }
    write_npy_u64(&dir.join("fhew_ksk_a.npy"), &[n * d_s, n_s], &ksk_a);
    write_npy_u64(&dir.join("fhew_ksk_b.npy"), &[n * d_s], &ksk_b);

    // brk: one RGSW ct per s_j. `Rgsw::sk_encrypt`'s plaintext wrapper is
    // pub(crate) (`rgsw.rs:34`), so its body (`rgsw.rs:85-105`) is replicated
    // inline: 2d RLWE zero-encrypts (each: a uniform, e dg — `rlwe.rs:146-157`),
    // then pt limbs added to the a-part of the first d and the b-part of the
    // last d. Layout dumped: (n_s, 2d, 2(a|b), n).
    let decomp = Base2Decomposor::<Zq>::new(q, log_b, d);
    let mut brk_flat = Vec::with_capacity(n_s * 2 * d * 2 * n);
    for sj in s_raw.iter() {
        let one = &Rq::one(q, n);
        let pt = one * (X ^ sj);
        let pt_limbs: Vec<Rq> = decomp.power_up(pt).collect();
        let mut cts: Vec<(Rq, Rq)> = (0..2 * d)
            .map(|_| {
                let a = Rq::sample_uniform(q, n, &mut kg);
                let e = Rq::sample_i64(q, n, dg(3.2, 6), &mut kg);
                let b = &a * &z_raw + e;
                (a, b)
            })
            .collect();
        for (i, pt) in pt_limbs.iter().enumerate() {
            cts[i].0 += pt; // c0: a-part
            cts[d + i].1 += pt; // c1: b-part
        }
        for (a, b) in &cts {
            brk_flat.extend(rq_u64(a));
            brk_flat.extend(rq_u64(b));
        }
    }
    write_npy_u64(&dir.join("fhew_brk.npy"), &[n_s, 2 * d, 2, n], &brk_flat);

    // ak: w+1 automorphism keys (`bootstrapping.rs:136-139`, pub ak_gen)
    let ts: Vec<i64> = param.ak_t().collect();
    let mut ak_flat = Vec::with_capacity(ts.len() * d * 2 * n);
    for t in &ts {
        let ak = Rlwe::ak_gen(param.rlwe(), *t, &z, &mut kg);
        for (a, b) in ak.a().zip(ak.b()) {
            ak_flat.extend(rq_u64(a));
            ak_flat.extend(rq_u64(b));
        }
    }
    write_npy_u64(
        &dir.join("fhew_ak_t.npy"),
        &[ts.len()],
        &ts.iter().map(|&t| t as u64).collect::<Vec<_>>(),
    );
    write_npy_u64(&dir.join("fhew_ak.npy"), &[ts.len(), d, 2, n], &ak_flat);

    // Gates over all four input combos (`boolean.rs:270-284` semantics).
    let enc = |m: bool, rng: &mut SplitMixRng| {
        let pt = Lwe::encode(param.lwe_z(), Zq::from_bool(p, m));
        Lwe::sk_encrypt(param.lwe_z(), &z, pt, rng)
    };
    let combos = [(false, false), (false, true), (true, false), (true, true)];
    let mut ins: Vec<LweCiphertext> = Vec::new();
    for (m0, m1) in combos {
        ins.push(enc(m0, &mut rng));
        ins.push(enc(m1, &mut rng));
    }
    let dump_cts = |cts: &[LweCiphertext], tag: &str, shape_a: &[usize]| {
        let mut a_flat = Vec::with_capacity(cts.len() * n);
        let mut b_flat = Vec::with_capacity(cts.len());
        for ct in cts {
            a_flat.extend(ct.a().iter().map(|v| v.to_u64()));
            b_flat.push(ct.b().to_u64());
        }
        write_npy_u64(&dir.join(format!("{tag}_a.npy")), shape_a, &a_flat);
        write_npy_u64(&dir.join(format!("{tag}_b.npy")), &[cts.len()], &b_flat);
    };
    dump_cts(&ins, "fhew_gate_in", &[4, 2, n]);

    type GateFn = fn(&FhewBootKey, LweCiphertext, LweCiphertext) -> LweCiphertext;
    let gates: [(&str, GateFn); 4] = [
        ("nand", Fhew::nand),
        ("and", Fhew::and),
        ("or", Fhew::or),
        ("xor", Fhew::xor),
    ];
    for (name, f) in gates {
        let outs: Vec<LweCiphertext> = (0..combos.len())
            .map(|i| f(&bk, ins[2 * i].clone(), ins[2 * i + 1].clone()))
            .collect();
        // sanity inside the dump itself: outputs decrypt to the truth table
        for ((m0, m1), ct) in combos.iter().zip(&outs) {
            let want = match name {
                "nand" => !(m0 & m1),
                "and" => m0 & m1,
                "or" => m0 | m1,
                "xor" => m0 ^ m1,
                _ => unreachable!(),
            };
            let got = Lwe::decode(param.lwe_z(), Lwe::decrypt(param.lwe_z(), &z, ct.clone()));
            assert_eq!(got.to_u64() == 1, want, "fhew {name} {m0} {m1}");
        }
        dump_cts(&outs, &format!("fhew_gate_{name}_out"), &[4, n]);
    }
}

// -- TFHE: programmable bootstrap transcript at the reference fixture --------
//
// Fixture: `scheme/tfhe/src/bootstrapping.rs:141-152` — log_p=4, padding=1,
// tlwe (n=1024, std 1.339775301998614e-7, log_b=4, d=5), tggsw (big_n=2048,
// n=1, std 2.845267479601915e-15, log_b=23, d=1).
//
// NOTE for the Python side: the JAX blind rotation applies the CMux monomial
// in the NTT domain ((X^a - 1) * ExtProd(brk, acc) + acc), which differs from
// the reference CMux by one decomposition-rounding term (ARCHITECTURE.md §4),
// so output ciphertexts are compared at the decrypt/phase level, not
// bit-exactly.

pub fn dump_tfhe(dir: &Path) {
    probe(dir, "tfhe", SEED_TFHE);
    let (log_p, padding) = (4usize, 1usize);
    let (n_lwe, std_lwe, log_b_ks, d_ks) = (1024usize, 1.339775301998614e-7f64, 4usize, 5usize);
    let tlwe = TlweParam::new(log_p, padding, n_lwe, std_lwe).with_decomposor(log_b_ks, d_ks);
    let (big_n, k, std_glwe, log_b, d) =
        (2048usize, 1usize, 2.845267479601915e-15f64, 23usize, 1usize);
    let tggsw = TggswParam::new(log_p, padding, big_n, k, std_glwe, log_b, d);
    let param = TfheBootParam::new(tlwe, tggsw);

    let mut rng = SplitMixRng::new(SEED_TFHE);

    // z: binary LWE key (`tlwe.rs:96-98`)
    let mut z_fork = rng.clone();
    let z = Tlwe::sk_gen(&param, &mut rng);
    let z_raw: AVec<i64> = AVec::sample(n_lwe, binary(), &mut z_fork);
    write_npy_u64(&dir.join("tfhe_sk_z.npy"), &[n_lwe], &avec_i64_u64(&z_raw));

    // Official keygen + replay (`tfhe/bootstrapping.rs:59-75`: s, brk, ksk).
    let mut kg = rng.clone();
    let bsk = TfheBootstrapping::key_gen(&param, &z, &mut rng);

    let mut s_fork = kg.clone();
    let s = Tggsw::sk_gen(param.tggsw(), &mut kg);
    let s_raw: AVec<i64> = AVec::sample(k * big_n, binary(), &mut s_fork);
    write_npy_u64(&dir.join("tfhe_sk_s.npy"), &[k, big_n], &avec_i64_u64(&s_raw));
    let s_rings: Vec<AVec<i64>> = s_raw
        .iter()
        .copied()
        .collect::<Vec<i64>>()
        .chunks(big_n)
        .map(|c| c.iter().copied().collect())
        .collect();

    // brk: one TGGSW per z_i. `TggswPlaintext` is pub(crate) (`tggsw.rs:42`),
    // so `Tggsw::sk_encrypt` (`tggsw.rs:73-89`) is replicated inline:
    // (k+1)*d TGLWE zero-encrypts (`tglwe.rs:91-103`: k ring uniforms, one
    // tdg error, b = a.s + e), pt limbs into a[chunk j] for the first k*d and
    // into b for the last d. Layout: (n_lwe, (k+1)*d, k+1(a...|b), big_n).
    let decomp = Base2Decomposor::<T64>::new(log_b, d);
    let mut brk_flat = Vec::with_capacity(n_lwe * (k + 1) * d * (k + 1) * big_n);
    for zi in z_raw.iter() {
        let pt = Rt::constant(T64::from(*zi as u64), big_n);
        let pt_limbs: Vec<Rt> = decomp.power_up(pt).collect();
        let mut cts: Vec<(Vec<Rt>, Rt)> = (0..(k + 1) * d)
            .map(|_| {
                let a: Vec<Rt> = (0..k).map(|_| Rt::sample_uniform(big_n, &mut kg)).collect();
                let e = Rt::sample(big_n, tdg(std_glwe), &mut kg);
                let mut b = e;
                for (aj, sj) in a.iter().zip(&s_rings) {
                    b += &(aj * sj);
                }
                (a, b)
            })
            .collect();
        for (j, chunk) in cts[..k * d].chunks_mut(d).enumerate() {
            for (ct, pt) in chunk.iter_mut().zip(&pt_limbs) {
                ct.0[j] += pt;
            }
        }
        let lo = k * d;
        for (ct, pt) in cts[lo..].iter_mut().zip(&pt_limbs) {
            ct.1 += pt;
        }
        for (a, b) in &cts {
            for aj in a {
                brk_flat.extend(rt_u64(aj));
            }
            brk_flat.extend(rt_u64(b));
        }
    }
    write_npy_u64(
        &dir.join("tfhe_brk.npy"),
        &[n_lwe, (k + 1) * d, k + 1, big_n],
        &brk_flat,
    );

    // ksk: k*big_n*d_ks TLWE cts under z (`tlwe.rs:100-111`, pub ksk_gen)
    let ksk = Tlwe::ksk_gen(&param, &z, &s, &mut kg);
    let mut ksk_a = Vec::new();
    let mut ksk_b = Vec::new();
    for a in ksk.a() {
        ksk_a.extend(a.iter().map(|t| t.to_u64()));
    }
    for b in ksk.b() {
        ksk_b.push(b.to_u64());
    }
    write_npy_u64(
        &dir.join("tfhe_ksk_a.npy"),
        &[k * big_n * d_ks, n_lwe],
        &ksk_a,
    );
    write_npy_u64(&dir.join("tfhe_ksk_b.npy"), &[k * big_n * d_ks], &ksk_b);

    // Test vectors: identity / double / parity tables
    // (`tfhe/bootstrapping.rs:115-136`, test-local helper replicated).
    let p = 1u64 << log_p;
    let table = |f: &dyn Fn(u64) -> u64| -> Rq {
        let m = big_n >> log_p;
        let vals: Vec<Zq> = (0..p).map(|v| Zq::from_u64(p, f(v))).collect();
        let mut out: Vec<Zq> = Vec::with_capacity(big_n);
        out.extend(std::iter::repeat(vals[0]).take(m / 2));
        for v in &vals[1..] {
            out.extend(std::iter::repeat(*v).take(m));
        }
        out.extend(std::iter::repeat(-vals[0]).take(m / 2));
        out.into_iter().collect()
    };
    let tables: [(&str, Box<dyn Fn(u64) -> u64>); 3] = [
        ("identity", Box::new(|v| v)),
        ("double", Box::new(move |v| (2 * v) % p)),
        ("parity", Box::new(|v| v % 2)),
    ];

    // Inputs: one fresh ct per message value
    let ins: Vec<TlweCiphertext> = (0..p)
        .map(|m| {
            let pt = Tlwe::encode(&param, Zq::from_u64(p, m));
            Tlwe::sk_encrypt(&param, &z, pt, &mut rng)
        })
        .collect();
    let mut in_a = Vec::new();
    let mut in_b = Vec::new();
    for ct in &ins {
        in_a.extend(ct.a().iter().map(|t| t.to_u64()));
        in_b.push(ct.b().to_u64());
    }
    write_npy_u64(&dir.join("tfhe_pbs_in_a.npy"), &[p as usize, n_lwe], &in_a);
    write_npy_u64(&dir.join("tfhe_pbs_in_b.npy"), &[p as usize], &in_b);

    for (name, f) in &tables {
        let v = table(f.as_ref());
        let vals: Vec<u64> = (0..p).map(|m| f(m)).collect();
        write_npy_u64(
            &dir.join(format!("tfhe_table_{name}.npy")),
            &[p as usize],
            &vals,
        );
        let mut out_a = Vec::new();
        let mut out_b = Vec::new();
        for (m, ct) in ins.iter().enumerate() {
            let out = TfheBootstrapping::bootstrap(&bsk, &v, ct.clone());
            let got = Tlwe::decode(&param, Tlwe::decrypt(&param, &z, out.clone()));
            assert_eq!(got.to_u64(), f(m as u64), "tfhe pbs {name} m={m}");
            out_a.extend(out.a().iter().map(|t| t.to_u64()));
            out_b.push(out.b().to_u64());
        }
        write_npy_u64(
            &dir.join(format!("tfhe_pbs_{name}_out_a.npy")),
            &[p as usize, n_lwe],
            &out_a,
        );
        write_npy_u64(
            &dir.join(format!("tfhe_pbs_{name}_out_b.npy")),
            &[p as usize],
            &out_b,
        );
    }
}

// -- CKKS: encrypt -> mul -> rotate -> conjugate -> decrypt transcript -------
//
// Fixture family: `scheme/ckks/src/ckks.rs:303-345` (log_qi=55, big_l=8) at
// log_n=9, the largest ring in the reference sweep. The whole evaluation
// path (mul, relinearize, rescale, rotate, conjugate) is deterministic given
// keys and ciphertexts, so those outputs must match BIT-EXACTLY.

fn rns_limbs(dir: &Path, tag: &str, x: &RnsRq) {
    use num_traits::ToPrimitive;
    let qs = x.qs();
    let n = x.n();
    let big = x.clone().into_bigint();
    let mut flat = Vec::with_capacity(qs.len() * n);
    for q in &qs {
        let qb = BigInt::from(*q);
        for c in &big {
            let r = ((c % &qb) + &qb) % &qb;
            flat.push(r.to_u64().unwrap());
        }
    }
    write_npy_u64(&dir.join(format!("{tag}_qs.npy")), &[qs.len()], &qs);
    write_npy_u64(&dir.join(format!("{tag}.npy")), &[qs.len(), n], &flat);
}

pub fn dump_ckks(dir: &Path) {
    probe(dir, "ckks", SEED_CKKS);
    let (log_n, log_qi, big_l) = (9usize, 55usize, 8usize);
    let param = CkksParam::new(log_n, log_qi, big_l);
    let n = param.n();
    let l = param.l();
    write_npy_u64(&dir.join("ckks_qs.npy"), &[param.qs().len()], param.qs());
    write_npy_u64(&dir.join("ckks_ps.npy"), &[param.ps().len()], param.ps());

    let mut rng = SplitMixRng::new(SEED_CKKS);

    // sk (`ckks.rs:139-141`: zo(0.5) of len n)
    let mut sk_fork = rng.clone();
    let sk = Ckks::sk_gen(&param, &mut rng);
    let sk_raw: AVec<i64> = AVec::sample(n, zo(0.5), &mut sk_fork);
    write_npy_u64(&dir.join("ckks_sk.npy"), &[n], &avec_i64_u64(&sk_raw));

    // pk / rlk / rtk(j=1) / cjk — all Deref down to CkksCiphertext with pub
    // a()/b() (`ckks.rs:88-106`), so the official objects dump directly.
    let pk = Ckks::pk_gen(&param, &sk, &mut rng);
    rns_limbs(dir, "ckks_pk_a", pk.a());
    rns_limbs(dir, "ckks_pk_b", pk.b());
    let rlk = Ckks::rlk_gen(&param, &sk, &mut rng);
    rns_limbs(dir, "ckks_rlk_a", rlk.a());
    rns_limbs(dir, "ckks_rlk_b", rlk.b());
    let rtk = Ckks::rtk_gen(&param, &sk, 1, &mut rng);
    rns_limbs(dir, "ckks_rtk1_a", rtk.a());
    rns_limbs(dir, "ckks_rtk1_b", rtk.b());
    let cjk = Ckks::cjk_gen(&param, &sk, &mut rng);
    rns_limbs(dir, "ckks_cjk_a", cjk.a());
    rns_limbs(dir, "ckks_cjk_b", cjk.b());

    // Messages in [-1, 1): deterministic f64s from the same stream
    let mk_msg = |rng: &mut SplitMixRng| -> (AVec<C256>, Vec<f64>) {
        let mut flat = Vec::with_capacity(2 * l);
        let m: AVec<C256> = (0..l)
            .map(|_| {
                let re = (rng.next_u64() >> 11) as f64 / (1u64 << 53) as f64 * 2.0 - 1.0;
                let im = (rng.next_u64() >> 11) as f64 / (1u64 << 53) as f64 * 2.0 - 1.0;
                flat.push(re);
                flat.push(im);
                C256::new(F256::from(re), F256::from(im))
            })
            .collect();
        (m, flat)
    };
    let (m0, m0_flat) = mk_msg(&mut rng);
    let (m1, m1_flat) = mk_msg(&mut rng);
    write_npy_f64(&dir.join("ckks_m0.npy"), &[l, 2], &m0_flat);
    write_npy_f64(&dir.join("ckks_m1.npy"), &[l, 2], &m1_flat);

    let pt0 = Ckks::encode(&param, m0);
    let pt1 = Ckks::encode(&param, m1);

    // sk-encrypt both, replaying the encrypt's samples (`ckks.rs:215-225`:
    // a uniform over qs, e dg) so the exact encode integers are derivable
    // from the dump as pt = b + a*sk - e (the Python side checks its own
    // encode against that bit-exactly).
    let mut enc_fork = rng.clone();
    let ct0 = Ckks::sk_encrypt(&param, &sk, pt0, &mut rng);
    {
        let a = RnsRq::sample_uniform(param.qs(), n, &mut enc_fork);
        let e = RnsRq::sample_i64(param.qs(), n, dg(3.2, 6), &mut enc_fork);
        rns_limbs(dir, "ckks_enc0_a", &a);
        rns_limbs(dir, "ckks_enc0_e", &e);
    }
    let mut enc_fork1 = rng.clone();
    let ct1 = Ckks::sk_encrypt(&param, &sk, pt1, &mut rng);
    {
        let a = RnsRq::sample_uniform(param.qs(), n, &mut enc_fork1);
        let e = RnsRq::sample_i64(param.qs(), n, dg(3.2, 6), &mut enc_fork1);
        rns_limbs(dir, "ckks_enc1_a", &a);
        rns_limbs(dir, "ckks_enc1_e", &e);
    }
    rns_limbs(dir, "ckks_ct0_a", ct0.a());
    rns_limbs(dir, "ckks_ct0_b", ct0.b());
    rns_limbs(dir, "ckks_ct1_a", ct1.a());
    rns_limbs(dir, "ckks_ct1_b", ct1.b());

    // mul + relin + rescale (`ckks.rs:255-272`) — deterministic, bit-exact
    let ct_mul = Ckks::mul(&param, &rlk, ct0.clone(), ct1.clone());
    rns_limbs(dir, "ckks_mul_a", ct_mul.a());
    rns_limbs(dir, "ckks_mul_b", ct_mul.b());
    // decrypted+decoded product for a tolerance check (F256 exposes no f64
    // conversion; Display -> parse loses nothing at the 40-bit budget).
    let dec = Ckks::decode(&param, Ckks::decrypt(&param, &sk, ct_mul));
    let dec_f64: Vec<f64> = dec
        .iter()
        .flat_map(|c| {
            let re: f64 = format!("{}", c.re).parse().unwrap_or(f64::NAN);
            let im: f64 = format!("{}", c.im).parse().unwrap_or(f64::NAN);
            [re, im]
        })
        .collect();
    write_npy_f64(&dir.join("ckks_mul_dec.npy"), &[l, 2], &dec_f64);

    // rotate by 1 and conjugate (`ckks.rs:274-282`) — deterministic
    let ct_rot = Ckks::rotate(&param, &rtk, ct0.clone());
    rns_limbs(dir, "ckks_rot1_a", ct_rot.a());
    rns_limbs(dir, "ckks_rot1_b", ct_rot.b());
    let ct_conj = Ckks::conjugate(&param, &cjk, ct0.clone());
    rns_limbs(dir, "ckks_conj_a", ct_conj.a());
    rns_limbs(dir, "ckks_conj_b", ct_conj.b());
}


// -- FHEW multi-key: crs -> share gen -> merge -> gate -> threshold decrypt --
//
// Fixture: `scheme/fhew/src/fhew/boolean.rs:321-335` — rgsw (log_q=54,
// log_n=9, log_b=6, d=9), lwe_s (n=100, q=2^16, log_b=4, d=4), w=10;
// 2 parties. Mirrors tools/pydump/fhew_mk_dump.py: identical SplitMix64
// stream and sampling order (crs, then all party sks, then pk shares, then
// per-party key shares, then the gate transcript).
//
// Private share structs are dumped via the replay-clone trick used by
// dump_fhew above: fork the RNG, call the official API on the main stream,
// re-sample the identical primitives from the fork for the bytes.

const SEED_FHEW_MK: u64 = 0xF4E2_2026_0820;
const MK_PARTIES: usize = 2;

pub fn dump_fhew_mk(dir: &Path) {
    probe(dir, "fhew_mk", SEED_FHEW_MK);
    let p = 4u64;
    let (log_q, log_n, log_b, d) = (54usize, 9usize, 6usize, 9usize);
    let q = util::two_adic_primes(log_q, log_n + 1).next().unwrap();
    let rlwe = RlweParam::new(q, p, log_n).with_decomposor(log_b, d);
    let rgsw = RgswParam::new(rlwe, log_b, d);
    let (n_s, q_s, log_b_s, d_s) = (100usize, 1u64 << 16, 4usize, 4usize);
    let lwe_s = LweParam::new(q_s, p, n_s).with_decomposor(log_b_s, d_s);
    let param = FhewBootParam::new(rgsw, lwe_s, 10);
    let n = param.n(); // 512
    let ts: Vec<i64> = param.ak_t().collect();
    let w1 = ts.len(); // w + 1

    let mut rng = SplitMixRng::new(SEED_FHEW_MK);

    // crs (`bootstrapping.rs:251-269`): pk poly, n*d_s LWE vectors
    // (digit-major pairing with power_up(-z).flatten()), (w+1)*d ak polys
    let mut crs_fork = rng.clone();
    let crs = FhewBootstrapping::crs_gen(&param, &mut rng);
    let crs_pk_a = Rq::sample_uniform(q, n, &mut crs_fork);
    let crs_ksk: Vec<AVec<Zq>> = (0..n * d_s)
        .map(|_| AVec::sample_uniform(q_s, n_s, &mut crs_fork))
        .collect();
    let crs_ak: Vec<Vec<Rq>> = (0..w1)
        .map(|_| (0..d).map(|_| Rq::sample_uniform(q, n, &mut crs_fork)).collect())
        .collect();
    write_npy_u64(&dir.join("fhew_mk_crs_pk_a.npy"), &[n], &rq_u64(&crs_pk_a));
    let mut ksk_crs_flat = Vec::with_capacity(n * d_s * n_s);
    for a in &crs_ksk {
        ksk_crs_flat.extend(a.iter().map(|v| v.to_u64()));
    }
    write_npy_u64(&dir.join("fhew_mk_crs_ksk_a.npy"), &[d_s, n, n_s], &ksk_crs_flat);
    let mut ak_crs_flat = Vec::with_capacity(w1 * d * n);
    for rows in &crs_ak {
        for a in rows {
            ak_crs_flat.extend(rq_u64(a));
        }
    }
    write_npy_u64(&dir.join("fhew_mk_crs_ak_a.npy"), &[w1, d, n], &ak_crs_flat);

    // party secrets, then pk shares, then merged pk (`boolean.rs:340-349` flow)
    let mut z_forks: Vec<SplitMixRng> = Vec::new();
    let zs: Vec<_> = (0..MK_PARTIES)
        .map(|_| {
            z_forks.push(rng.clone());
            Rlwe::sk_gen(param.rlwe(), &mut rng)
        })
        .collect();
    let z_raws: Vec<AVec<i64>> = z_forks
        .iter_mut()
        .map(|f| AVec::sample(n, dg(3.2, 6), f))
        .collect();
    for (pi, z_raw) in z_raws.iter().enumerate() {
        write_npy_u64(
            &dir.join(format!("fhew_mk_sk_z{pi}.npy")),
            &[n],
            &avec_i64_u64(z_raw),
        );
    }
    let mut pk_share_bs: Vec<Rq> = Vec::new();
    let pk_shares: Vec<_> = zs
        .iter()
        .enumerate()
        .map(|(pi, z)| {
            let mut f = rng.clone();
            let share = Rlwe::pk_share_gen(param.rlwe(), crs.pk(), z, &mut rng);
            let e = Rq::sample_i64(q, n, dg(3.2, 6), &mut f);
            let b = &crs_pk_a * &z_raws[pi] + e;
            write_npy_u64(&dir.join(format!("fhew_mk_pk_share{pi}.npy")), &[n], &rq_u64(&b));
            pk_share_bs.push(b);
            share
        })
        .collect();
    let pk = Rlwe::pk_share_merge(param.rlwe(), crs.pk().clone(), pk_shares);
    let pk_b: Rq = pk_share_bs.iter().sum();
    write_npy_u64(&dir.join("fhew_mk_pk_b.npy"), &[n], &rq_u64(&pk_b));

    // per-party bootstrap key shares (`bootstrapping.rs:271-293`), replayed
    // for bytes: s (n_s dg), ksk share (one dg scalar per crs row,
    // digit-major), brk share (per key bit: 2d pk zero-encrypts, each
    // u <- zo(0.5), e0, e1 <- dg), ak shares (per t, per digit: dg poly)
    let decomp = Base2Decomposor::<Zq>::new(q, log_b, d);
    let decomp_s = Base2Decomposor::<Zq>::new(q_s, log_b_s, d_s);
    let mut share_brks: Vec<Vec<Vec<(Rq, Rq)>>> = Vec::new();
    let mut share_ksk_bs: Vec<Vec<Zq>> = Vec::new();
    let mut share_ak_bs: Vec<Vec<Vec<Rq>>> = Vec::new();
    let bk_shares: Vec<_> = zs
        .iter()
        .enumerate()
        .map(|(pi, z)| {
            let mut f = rng.clone();
            let share = FhewBootstrapping::key_share_gen(&param, &crs, z, &pk, &mut rng);
            let z_raw = &z_raws[pi];
            // replay
            let s_raw: AVec<i64> = AVec::sample(n_s, dg(3.2, 6), &mut f);
            let mut ksk_b: Vec<Zq> = Vec::with_capacity(n * d_s);
            for (k, crs_row) in crs_ksk.iter().enumerate() {
                let digit = k / n;
                let i = k % n;
                let bits = decomp_s.log_bases().nth(digit).unwrap();
                let pt = Zq::from_i64(q_s, -(z_raw[i] << bits));
                let e = Zq::sample_i64(q_s, dg(3.2, 6), &mut f);
                let b = crs_row.dot(&s_raw) + pt + e;
                ksk_b.push(b);
            }
            let mut brk: Vec<Vec<(Rq, Rq)>> = Vec::with_capacity(n_s);
            for sj in s_raw.iter() {
                let one = &Rq::one(q, n);
                let pt = one * (X ^ sj);
                let pt_limbs: Vec<Rq> = decomp.power_up(pt).collect();
                let mut cts: Vec<(Rq, Rq)> = (0..2 * d)
                    .map(|_| {
                        let u: AVec<i64> = AVec::sample(n, zo(0.5), &mut f);
                        let e0 = Rq::sample_i64(q, n, dg(3.2, 6), &mut f);
                        let e1 = Rq::sample_i64(q, n, dg(3.2, 6), &mut f);
                        let a = &crs_pk_a * &u + e0;
                        let b = &pk_b * &u + e1;
                        (a, b)
                    })
                    .collect();
                for (i, pt) in pt_limbs.iter().enumerate() {
                    cts[i].0 += pt;
                    cts[d + i].1 += pt;
                }
                brk.push(cts);
            }
            let mut ak_b: Vec<Vec<Rq>> = Vec::with_capacity(w1);
            for (ti, t) in ts.iter().enumerate() {
                let z_auto = z_raw.automorphism(*t);
                let mut rows = Vec::with_capacity(d);
                for (di, bits) in decomp.log_bases().enumerate() {
                    let pt: Rq = z_auto.iter().map(|v| Zq::from_i64(q, -(v << bits))).collect();
                    let e = Rq::sample_i64(q, n, dg(3.2, 6), &mut f);
                    let b = &crs_ak[ti][di] * z_raw + e + pt;
                    rows.push(b);
                }
                ak_b.push(rows);
            }
            // dump the share bytes
            let mut ksk_flat: Vec<u64> = ksk_b.iter().map(|v| v.to_u64()).collect();
            write_npy_u64(&dir.join(format!("fhew_mk_ksk_b_share{pi}.npy")), &[d_s, n], &ksk_flat);
            ksk_flat.clear();
            let mut brk_flat = Vec::with_capacity(n_s * 2 * d * 2 * n);
            for rows in &brk {
                for (a, b) in rows {
                    brk_flat.extend(rq_u64(a));
                    brk_flat.extend(rq_u64(b));
                }
            }
            write_npy_u64(&dir.join(format!("fhew_mk_brk_share{pi}.npy")), &[n_s, 2 * d, 2, n], &brk_flat);
            let mut ak_flat = Vec::with_capacity(w1 * d * n);
            for rows in &ak_b {
                for b in rows {
                    ak_flat.extend(rq_u64(b));
                }
            }
            write_npy_u64(&dir.join(format!("fhew_mk_ak_b_share{pi}.npy")), &[w1, d, n], &ak_flat);
            share_brks.push(brk);
            share_ksk_bs.push(ksk_b);
            share_ak_bs.push(ak_b);
            share
        })
        .collect();

    // official merge (pub API) for the gate evaluation
    let bk = FhewBootstrapping::key_share_merge(&param, crs, bk_shares);

    // merged key bytes from the replayed shares: ksk/ak sum; brk folds via
    // the internal-product semantics (`rgsw.rs:130-150`) replicated inline
    // over the replayed rows (evaluation-basis dot == exact coefficient dot)
    let merged_ksk: Vec<Zq> = (0..n * d_s)
        .map(|k| share_ksk_bs.iter().map(|s| s[k]).sum())
        .collect();
    write_npy_u64(
        &dir.join("fhew_mk_ksk_b.npy"),
        &[d_s, n],
        &merged_ksk.iter().map(|v| v.to_u64()).collect::<Vec<_>>(),
    );
    let ext = |rows: &Vec<(Rq, Rq)>, a: &Rq, b: &Rq| -> (Rq, Rq) {
        let limbs: Vec<Rq> = decomp.decompose(a).chain(decomp.decompose(b)).collect();
        let mut oa = Rq::zero(q, n);
        let mut ob = Rq::zero(q, n);
        for ((ra, rb), l) in rows.iter().zip(&limbs) {
            oa += ra * l;
            ob += rb * l;
        }
        (oa, ob)
    };
    let mut merged_brk: Vec<Vec<(Rq, Rq)>> = share_brks[0].clone();
    for pshare in &share_brks[1..] {
        for j in 0..n_s {
            merged_brk[j] = pshare[j]
                .iter()
                .map(|(a, b)| ext(&merged_brk[j], a, b))
                .collect();
        }
    }
    let mut brk_flat = Vec::with_capacity(n_s * 2 * d * 2 * n);
    for rows in &merged_brk {
        for (a, b) in rows {
            brk_flat.extend(rq_u64(a));
            brk_flat.extend(rq_u64(b));
        }
    }
    write_npy_u64(&dir.join("fhew_mk_brk.npy"), &[n_s, 2 * d, 2, n], &brk_flat);
    write_npy_u64(
        &dir.join("fhew_mk_ak_t.npy"),
        &[w1],
        &ts.iter().map(|&t| t as u64).collect::<Vec<_>>(),
    );

    // gate transcript: FhewBool::pk_encrypt path (`boolean.rs:27-35`:
    // RLWE pk-encrypt of the constant poly, sample_extract(0)), nand under
    // the merged key, per-party threshold decrypt shares
    let mut ins_flat_a = Vec::new();
    let mut ins_flat_b = Vec::new();
    let mut outs: Vec<LweCiphertext> = Vec::new();
    let mut dec_shares: Vec<u64> = Vec::new();
    for mp in 0..4u64 {
        let (m0, m1) = (mp & 1 == 1, (mp >> 1) & 1 == 1);
        let cts: Vec<LweCiphertext> = [m0, m1]
            .iter()
            .map(|&m| {
                let mc = Rq::constant(Zq::from_bool(p, m), n);
                let pt = Rlwe::encode(param.rlwe(), mc);
                let ct = Rlwe::pk_encrypt(param.rlwe(), &pk, pt, &mut rng);
                Rlwe::sample_extract(param.rlwe(), ct, 0)
            })
            .collect();
        let out = Fhew::nand(&bk, cts[0].clone(), cts[1].clone());
        for ct in &cts {
            ins_flat_a.extend(ct.a().iter().map(|v| v.to_u64()));
            ins_flat_b.push(ct.b().to_u64());
        }
        // threshold decrypt (`lwe.rs:184-214`): share = a.z + e per party —
        // one dg scalar per party, sampled on the main stream (the exact
        // consumption of Lwe::share_decrypt, whose share struct is private)
        let mut pt_sum = Zq::from_u64(q, 0);
        for z_raw in &z_raws {
            let e = Zq::sample_i64(q, dg(3.2, 6), &mut rng);
            let share = out.a().dot(z_raw) + e;
            dec_shares.push(share.to_u64());
            pt_sum = pt_sum + share;
        }
        // sanity: threshold decode == NAND truth
        let pt = *out.b() - pt_sum;
        let got = Lwe::decode(param.lwe_z(), fhew::lwe::LwePlaintext(pt));
        assert_eq!(got.to_u64() == 1, !(m0 & m1), "fhew_mk nand {m0} {m1}");
        outs.push(out);
    }
    write_npy_u64(&dir.join("fhew_mk_gate_in_a.npy"), &[4, 2, n], &ins_flat_a);
    write_npy_u64(&dir.join("fhew_mk_gate_in_b.npy"), &[8], &ins_flat_b);
    let mut out_a = Vec::with_capacity(4 * n);
    let mut out_b = Vec::with_capacity(4);
    for ct in &outs {
        out_a.extend(ct.a().iter().map(|v| v.to_u64()));
        out_b.push(ct.b().to_u64());
    }
    write_npy_u64(&dir.join("fhew_mk_gate_nand_out_a.npy"), &[4, n], &out_a);
    write_npy_u64(&dir.join("fhew_mk_gate_nand_out_b.npy"), &[4], &out_b);
    write_npy_u64(&dir.join("fhew_mk_gate_dec_shares.npy"), &[4, MK_PARTIES], &dec_shares);
}

pub fn dump_all(dir: &Path) {
    dump_fhew(dir);
    dump_tfhe(dir);
    dump_ckks(dir);
    dump_fhew_mk(dir);
    println!("wrote scheme transcripts to {}", dir.display());
}
