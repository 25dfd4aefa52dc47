//! Dump reference-computed golden vectors for cross-implementation parity.
//!
//! Inputs are generated with splitmix64 (seeded, implemented identically in
//! tests/test_rust_dump.py) so both implementations agree on them without
//! sharing an RNG library; outputs are written as .npy files (hand-rolled
//! writer, no deps) into the directory given as argv[1].
//!
//! Vectors (all RNG-free reference paths, so bit-parity is meaningful):
//!   zq_mul_q28 / zq_mul_q55 : negacyclic ring products over NTT primes
//!                             (`util/src/ring/fft/zq.rs` via Rq MulAssign)
//!   t64_mul                 : exact torus product through FFT64
//!                             (`util/src/ring/fft/c64.rs:43-85`)
//!   decomp_zq / decomp_t64  : gadget decompositions with the Decomposor's
//!                             rounding semantics (`misc/decompose.rs`)

use std::env;
use std::fs;
use std::io::Write;
use std::path::Path;

use util::{Base2Decomposor, Rq, Rt, T64, Zq};

mod transcripts;

// -- splitmix64: the shared deterministic input stream -----------------------

#[derive(Clone)]
pub struct SplitMix64(pub u64);

impl SplitMix64 {
    pub fn next(&mut self) -> u64 {
        self.0 = self.0.wrapping_add(0x9E3779B97F4A7C15);
        let mut z = self.0;
        z = (z ^ (z >> 30)).wrapping_mul(0xBF58476D1CE4E5B9);
        z = (z ^ (z >> 27)).wrapping_mul(0x94D049BB133111EB);
        z ^ (z >> 31)
    }

    fn below(&mut self, bound: u64) -> u64 {
        // rejection-free modulo is fine here: both sides use the same formula
        self.next() % bound
    }
}

const SEED: u64 = 0x1FE2026_08_17;

// -- minimal .npy writer (version 1.0, little-endian u64) --------------------

pub fn write_npy_u64(path: &Path, shape: &[usize], data: &[u64]) {
    write_npy_raw(path, shape, "<u8", &data.iter().flat_map(|v| v.to_le_bytes()).collect::<Vec<_>>())
}

pub fn write_npy_f64(path: &Path, shape: &[usize], data: &[f64]) {
    write_npy_raw(path, shape, "<f8", &data.iter().flat_map(|v| v.to_le_bytes()).collect::<Vec<_>>())
}

fn write_npy_raw(path: &Path, shape: &[usize], descr: &str, bytes: &[u8]) {
    assert_eq!(shape.iter().product::<usize>() * 8, bytes.len());
    let shape_str = match shape.len() {
        1 => format!("({},)", shape[0]),
        _ => format!(
            "({})",
            shape.iter().map(|s| s.to_string()).collect::<Vec<_>>().join(", ")
        ),
    };
    let mut header = format!(
        "{{'descr': '{}', 'fortran_order': False, 'shape': {}, }}",
        descr, shape_str
    );
    let unpadded = 10 + header.len() + 1; // magic(8) + len(2) + header + \n
    let pad = (64 - unpadded % 64) % 64;
    header.push_str(&" ".repeat(pad));
    header.push('\n');
    let mut out = Vec::with_capacity(10 + header.len() + bytes.len());
    out.extend_from_slice(b"\x93NUMPY\x01\x00");
    out.extend_from_slice(&(header.len() as u16).to_le_bytes());
    out.extend_from_slice(header.as_bytes());
    out.extend_from_slice(bytes);
    let mut f = fs::File::create(path).unwrap();
    f.write_all(&out).unwrap();
}

// -- sections ----------------------------------------------------------------

fn dump_zq_mul(dir: &Path, tag: &str, q: u64, n: usize, rng: &mut SplitMix64) {
    let a: Vec<u64> = (0..n).map(|_| rng.below(q)).collect();
    let b: Vec<u64> = (0..n).map(|_| rng.below(q)).collect();
    let mut ra: Rq = a.iter().map(|&v| Zq::from_u64(q, v)).collect();
    let rb: Rq = b.iter().map(|&v| Zq::from_u64(q, v)).collect();
    ra *= &rb;
    let c: Vec<u64> = ra.into_iter().map(|z| z.to_u64()).collect();
    write_npy_u64(&dir.join(format!("{tag}_q.npy")), &[1], &[q]);
    write_npy_u64(&dir.join(format!("{tag}_a.npy")), &[n], &a);
    write_npy_u64(&dir.join(format!("{tag}_b.npy")), &[n], &b);
    write_npy_u64(&dir.join(format!("{tag}_c.npy")), &[n], &c);
}

fn dump_t64_mul(dir: &Path, n: usize, log_bound: u32, rng: &mut SplitMix64) {
    // a stays small (the FFT64 path is exact only for bounded operands,
    // `c64.rs:187-208`): signed in (-2^log_bound, 2^log_bound)
    let span = 1u64 << (log_bound + 1);
    let a: Vec<u64> = (0..n)
        .map(|_| (rng.below(span) as i64 - (1i64 << log_bound)) as u64)
        .collect();
    let b: Vec<u64> = (0..n).map(|_| rng.next()).collect();
    let mut ra: Rt = a.iter().map(|&v| T64::from(v)).collect();
    let rb: Rt = b.iter().map(|&v| T64::from(v)).collect();
    ra *= &rb;
    let c: Vec<u64> = ra.into_iter().map(|t| t.to_u64()).collect();
    write_npy_u64(&dir.join("t64_mul_a.npy"), &[n], &a);
    write_npy_u64(&dir.join("t64_mul_b.npy"), &[n], &b);
    write_npy_u64(&dir.join("t64_mul_c.npy"), &[n], &c);
}

fn dump_decomp_zq(dir: &Path, q: u64, log_b: usize, d: usize, k: usize, rng: &mut SplitMix64) {
    let decomposor = Base2Decomposor::<Zq>::new(q, log_b, d);
    let x: Vec<u64> = (0..k).map(|_| rng.below(q)).collect();
    let mut digits = vec![0u64; d * k];
    for (i, &v) in x.iter().enumerate() {
        for (j, limb) in decomposor.decompose(&Zq::from_u64(q, v)).enumerate() {
            digits[j * k + i] = limb.to_u64();
        }
    }
    write_npy_u64(&dir.join("decomp_zq_q.npy"), &[1], &[q]);
    write_npy_u64(&dir.join("decomp_zq_x.npy"), &[k], &x);
    write_npy_u64(&dir.join("decomp_zq_digits.npy"), &[d, k], &digits);
}

fn dump_decomp_t64(dir: &Path, log_b: usize, d: usize, k: usize, rng: &mut SplitMix64) {
    let decomposor = Base2Decomposor::<T64>::new(log_b, d);
    let x: Vec<u64> = (0..k).map(|_| rng.next()).collect();
    let mut digits = vec![0u64; d * k];
    for (i, &v) in x.iter().enumerate() {
        for (j, limb) in decomposor.decompose(&T64::from(v)).enumerate() {
            digits[j * k + i] = limb.to_u64();
        }
    }
    write_npy_u64(&dir.join("decomp_t64_x.npy"), &[k], &x);
    write_npy_u64(&dir.join("decomp_t64_digits.npy"), &[d, k], &digits);
}

fn main() {
    let dir = env::args().nth(1).unwrap_or_else(|| "rust_dump".into());
    let dir = Path::new(&dir);
    fs::create_dir_all(dir).unwrap();

    // the same prime-search the JAX side uses: two_adic_primes(bits, log_n+1)
    let q28 = util::two_adic_primes(28, 8).next().unwrap();
    let q55 = util::two_adic_primes(55, 6).next().unwrap();

    let mut rng = SplitMix64(SEED);
    dump_zq_mul(dir, "zq_mul_q28", q28, 64, &mut rng);
    dump_zq_mul(dir, "zq_mul_q55", q55, 32, &mut rng);
    dump_t64_mul(dir, 64, 22, &mut rng);
    dump_decomp_zq(dir, q28, 7, 4, 128, &mut rng);
    dump_decomp_t64(dir, 23, 2, 128, &mut rng);
    println!("wrote reference vectors to {}", dir.display());

    // full scheme transcripts: keygen -> encrypt -> bootstrap/gate/mul ->
    // decrypt (tests/test_rust_transcripts.py consumes these)
    transcripts::dump_all(dir);
}
