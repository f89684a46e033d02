module @_grid_entry {
  func.func @main(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32, %arg4: memref<1x1x128x128xbf16, #tpu.memory_space<vmem>>, %arg5: memref<1x1x128x128xbf16, #tpu.memory_space<vmem>>, %arg6: memref<1x1x128x128xbf16, #tpu.memory_space<vmem>>, %arg7: memref<1x1x128x128xbf16, #tpu.memory_space<vmem>>, %arg8: memref<128x128xf32, #tpu.memory_space<vmem>>, %arg9: memref<128x128xf32, #tpu.memory_space<vmem>>, %arg10: memref<128x128xf32, #tpu.memory_space<vmem>>) attributes {dimension_semantics = [#tpu.dimension_semantics<parallel>, #tpu.dimension_semantics<parallel>, #tpu.dimension_semantics<parallel>, #tpu.dimension_semantics<arbitrary>], iteration_bounds = array<i64: 1, 4, 16, 16>, scalar_prefetch = 0 : i64, scratch_operands = 3 : i64, window_params = [{transform_indices = @transform_0, window_bounds = array<i64: 1, 1, 128, 128>}, {transform_indices = @transform_1, window_bounds = array<i64: 1, 1, 128, 128>}, {transform_indices = @transform_2, window_bounds = array<i64: 1, 1, 128, 128>}, {transform_indices = @transform_3, window_bounds = array<i64: 1, 1, 128, 128>}]} {
    %cst = arith.constant dense<0.0883883461> : vector<128x128xf32>
    %cst_0 = arith.constant dense<-1.000000e+30> : vector<128x128xf32>
    %cst_1 = arith.constant dense<0.000000e+00> : vector<128xf32>
    %cst_2 = arith.constant dense<0xFF800000> : vector<128xf32>
    %cst_3 = arith.constant dense<0.000000e+00> : vector<128x128xf32>
    %c0 = arith.constant 0 : index
    %c15_i32 = arith.constant 15 : i32
    %c0_i32 = arith.constant 0 : i32
    %0 = arith.cmpi eq, %arg3, %c0_i32 : i32
    %1 = arith.cmpi eq, %arg3, %c15_i32 : i32
    %2 = vector.load %arg4[%c0, %c0, %c0, %c0] : memref<1x1x128x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x128x128xbf16>
    %3 = vector.shape_cast %2 : vector<1x1x128x128xbf16> to vector<128x128xbf16>
    %4 = vector.load %arg5[%c0, %c0, %c0, %c0] : memref<1x1x128x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x128x128xbf16>
    %5 = vector.shape_cast %4 : vector<1x1x128x128xbf16> to vector<128x128xbf16>
    %6 = vector.load %arg6[%c0, %c0, %c0, %c0] : memref<1x1x128x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x128x128xbf16>
    %7 = vector.shape_cast %6 : vector<1x1x128x128xbf16> to vector<128x128xbf16>
    %8 = tpu.matmul %3, %5, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<128x128xbf16>, vector<128x128xbf16>, vector<128x128xf32> -> vector<128x128xf32>
    scf.if %0 {
      tpu.vector_store %arg9[%c0, %c0], %cst_0 {strides = array<i32>} : memref<128x128xf32, #tpu.memory_space<vmem>>, vector<128x128xf32>, 
      tpu.vector_store %arg10[%c0, %c0], %cst_3 {strides = array<i32>} : memref<128x128xf32, #tpu.memory_space<vmem>>, vector<128x128xf32>, 
      tpu.vector_store %arg8[%c0, %c0], %cst_3 {strides = array<i32>} : memref<128x128xf32, #tpu.memory_space<vmem>>, vector<128x128xf32>, 
    }
    %9 = vector.load %arg9[%c0, %c0] : memref<128x128xf32, #tpu.memory_space<vmem>>, vector<128x128xf32>
    %10 = vector.load %arg10[%c0, %c0] : memref<128x128xf32, #tpu.memory_space<vmem>>, vector<128x128xf32>
    %11 = vector.load %arg8[%c0, %c0] : memref<128x128xf32, #tpu.memory_space<vmem>>, vector<128x128xf32>
    %12 = arith.mulf %8, %cst : vector<128x128xf32>
    %13 = vector.multi_reduction <maximumf>, %12, %cst_2 [1] : vector<128x128xf32> to vector<128xf32>
    %14 = vector.shape_cast %13 : vector<128xf32> to vector<128x1xf32>
    %15 = vector.broadcast %14 : vector<128x1xf32> to vector<128x128xf32>
    %16 = arith.maximumf %9, %15 : vector<128x128xf32>
    %17 = vector.extract_strided_slice %16 {offsets = [0, 0], sizes = [128, 1], strides = [1, 1]} : vector<128x128xf32> to vector<128x1xf32>
    %18 = vector.broadcast %17 : vector<128x1xf32> to vector<128x128xf32>
    %19 = arith.subf %12, %18 : vector<128x128xf32>
    %20 = math.exp %19 : vector<128x128xf32>
    %21 = arith.subf %9, %16 : vector<128x128xf32>
    %22 = math.exp %21 : vector<128x128xf32>
    %23 = arith.truncf %20 : vector<128x128xf32> to vector<128x128xbf16>
    %24 = arith.mulf %10, %22 : vector<128x128xf32>
    %25 = vector.multi_reduction <add>, %20, %cst_1 [1] : vector<128x128xf32> to vector<128xf32>
    %26 = vector.shape_cast %25 : vector<128xf32> to vector<128x1xf32>
    %27 = vector.broadcast %26 : vector<128x1xf32> to vector<128x128xf32>
    %28 = arith.addf %24, %27 : vector<128x128xf32>
    %29 = tpu.matmul %23, %7, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<128x128xbf16>, vector<128x128xbf16>, vector<128x128xf32> -> vector<128x128xf32>
    %30 = vector.extract_strided_slice %22 {offsets = [0, 0], sizes = [128, 1], strides = [1, 1]} : vector<128x128xf32> to vector<128x1xf32>
    %31 = vector.broadcast %30 : vector<128x1xf32> to vector<128x128xf32>
    %32 = arith.mulf %11, %31 : vector<128x128xf32>
    %33 = arith.addf %32, %29 : vector<128x128xf32>
    tpu.vector_store %arg9[%c0, %c0], %16 {strides = array<i32>} : memref<128x128xf32, #tpu.memory_space<vmem>>, vector<128x128xf32>, 
    tpu.vector_store %arg10[%c0, %c0], %28 {strides = array<i32>} : memref<128x128xf32, #tpu.memory_space<vmem>>, vector<128x128xf32>, 
    tpu.vector_store %arg8[%c0, %c0], %33 {strides = array<i32>} : memref<128x128xf32, #tpu.memory_space<vmem>>, vector<128x128xf32>, 
    scf.if %1 {
      %34 = vector.load %arg10[%c0, %c0] : memref<128x128xf32, #tpu.memory_space<vmem>>, vector<128x1xf32>
      %35 = vector.load %arg8[%c0, %c0] : memref<128x128xf32, #tpu.memory_space<vmem>>, vector<128x128xf32>
      %36 = vector.broadcast %34 : vector<128x1xf32> to vector<128x128xf32>
      %37 = arith.divf %35, %36 : vector<128x128xf32>
      %38 = arith.truncf %37 : vector<128x128xf32> to vector<128x128xbf16>
      %39 = vector.shape_cast %38 : vector<128x128xbf16> to vector<1x1x128x128xbf16>
      tpu.vector_store %arg7[%c0, %c0, %c0, %c0], %39 {strides = array<i32>} : memref<1x1x128x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x128x128xbf16>, 
    }
    return
  }
  func.func @transform_0(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c0_i32 = arith.constant 0 : i32
    return %arg0, %arg1, %arg2, %c0_i32 : i32, i32, i32, i32
  }
  func.func @transform_1(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c0_i32 = arith.constant 0 : i32
    return %arg0, %arg1, %arg3, %c0_i32 : i32, i32, i32, i32
  }
  func.func @transform_2(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c0_i32 = arith.constant 0 : i32
    return %arg0, %arg1, %arg3, %c0_i32 : i32, i32, i32, i32
  }
  func.func @transform_3(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c0_i32 = arith.constant 0 : i32
    return %arg0, %arg1, %arg2, %c0_i32 : i32, i32, i32, i32
  }
}

