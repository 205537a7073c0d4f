// Head-to-head throughput: the REFERENCE engine (OpenETL dist bundle,
// run as a black box via its public Orchestrator API) pulling rows from
// an in-memory offset-paginated adapter and applying a 3-step transform
// chain. Workload mirrors engine_bench.py: 600,000 rows (the
// reference's hard cap is 1,000,000), pages of 1,000.
//
// Run: NODE_PATH=<axios-stub dir> node reference_bench.js
const { Orchestrator } = require("/root/reference/dist/index.js");

const N = parseInt(process.env.REF_BENCH_ROWS || "600000", 10);
const PAGE = 1000;

function makeRow(i) {
  return {
    id: i,
    flag: i % 3 === 0 ? "a" : i % 3 === 1 ? "n" : "r",
    status: i % 2 === 0 ? "o" : "f",
    qty: String((i % 50) + 0.5),
    price: 900 + (i % 100000) / 7,
  };
}

const adapter = (connector, auth) => ({
  id: "mem-adapter",
  connect: async () => {},
  disconnect: async () => {},
  download: async (opts) => {
    const off = opts.offset || 0;
    const lim = Math.min(opts.limit, PAGE);
    const end = Math.min(off + lim, N);
    const data = [];
    for (let i = off; i < end; i++) data.push(makeRow(i));
    return { data };
  },
  getConfig: () => ({
    id: "mem-adapter",
    name: "mem",
    type: "source",
    action: ["download"],
    credential_type: "api_key",
    base_url: "",
    endpoints: [{ id: "rows", path: "/rows", method: "GET", supported_actions: ["download"] }],
    pagination: { type: "offset", itemsPerPage: PAGE },
  }),
});

const vault = {
  cred: { id: "cred", name: "c", environment: "p", type: "api_key", credentials: { api_key: "x" } },
};

async function main() {
  const orch = Orchestrator(vault, { "mem-adapter": adapter });
  const t0 = process.hrtime.bigint();
  const result = await orch.runPipeline({
    id: "bench",
    source: {
      adapter_id: "mem-adapter",
      endpoint_id: "rows",
      credential_id: "cred",
      fields: ["id", "flag", "status", "qty", "price"],
      transform: [
        { type: "uppercase", options: { field: "flag", to: "flag_up" } },
        { type: "concat", options: { properties: ["flag", "status"], glue: "|", to: "tag" } },
        { type: "toNumber", options: { field: "qty", to: "qty_num" } },
      ],
      pagination: { type: "offset", itemsPerPage: PAGE },
      timeout: 600000,
      limit: 1000000,
    },
  });
  const sec = Number(process.hrtime.bigint() - t0) / 1e9;
  console.log(
    JSON.stringify({
      engine: "reference-openetl",
      rows: result.data.length,
      sec: Math.round(sec * 1000) / 1000,
      rows_per_sec: Math.round(result.data.length / sec),
    })
  );
}

main().catch((e) => {
  console.error(e);
  process.exit(1);
});
